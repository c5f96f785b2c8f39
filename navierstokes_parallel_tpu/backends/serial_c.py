"""ctypes bindings for the native C serial backend (csrc/nsp_serial.c).

The framework's equivalent of the reference's serial C build: a fast float64
CPU oracle and the "serial" baseline for the benchmark harness.  Builds the
shared library on demand via `make -C csrc` (g++ toolchain is assumed, as in
the reference's CMake flow)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple, Optional, Tuple

import numpy as np

from ..config import Params

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_LIB_PATH = os.path.join(_REPO_ROOT, "build", "libnsp_serial.so")
_EXE_PATH = os.path.join(_REPO_ROOT, "build", "nsp_serial")
_lib = None


class _CParams(ctypes.Structure):
    _fields_ = [
        ("problem", ctypes.c_int),
        ("f", ctypes.c_double),
        ("i_max", ctypes.c_int),
        ("j_max", ctypes.c_int),
        ("a", ctypes.c_double),
        ("b", ctypes.c_double),
        ("T", ctypes.c_double),
        ("Re", ctypes.c_double),
        ("g_x", ctypes.c_double),
        ("g_y", ctypes.c_double),
        ("tau", ctypes.c_double),
        ("omega", ctypes.c_double),
        ("epsilon", ctypes.c_double),
        ("max_it", ctypes.c_int),
        ("n_print", ctypes.c_int),
    ]


class _CStats(ctypes.Structure):
    _fields_ = [
        ("steps", ctypes.c_long),
        ("total_sor_iters", ctypes.c_long),
        ("sor_failures", ctypes.c_long),
        ("t", ctypes.c_double),
        ("sor_seconds", ctypes.c_double),
    ]


class SerialResult(NamedTuple):
    u: np.ndarray
    v: np.ndarray
    p: np.ndarray
    t: float
    steps: int
    total_sor_iterations: int
    sor_failures: int
    sor_seconds: float


def build(force: bool = False) -> str:
    """Compile the native backend if needed; returns the library path."""
    src = os.path.join(_REPO_ROOT, "csrc", "nsp_serial.c")
    if not os.path.exists(src):
        raise FileNotFoundError(
            f"native backend source not found at {src}: the serial C "
            "backend requires a source checkout (csrc/ ships in the sdist "
            "but not in wheels)"
        )
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "csrc")],
            check=True,
            capture_output=True,
        )
    return _LIB_PATH


def executable_path() -> str:
    """Path to the standalone CLI (reference stdout/stderr protocol)."""
    build()
    return _EXE_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        dptr = ctypes.POINTER(ctypes.c_double)
        lib.nsp_solve.restype = ctypes.c_int
        lib.nsp_solve.argtypes = [
            ctypes.POINTER(_CParams), dptr, dptr, dptr, ctypes.POINTER(_CStats)
        ]
        lib.nsp_sor.restype = ctypes.c_long
        lib.nsp_sor.argtypes = [ctypes.POINTER(_CParams), dptr, dptr, dptr]
        _lib = lib
    return _lib


def _c_params(params: Params) -> _CParams:
    return _CParams(
        problem=params.problem, f=params.f, i_max=params.i_max,
        j_max=params.j_max, a=params.a, b=params.b, T=params.T, Re=params.Re,
        g_x=params.g_x, g_y=params.g_y, tau=params.tau, omega=params.omega,
        epsilon=params.epsilon, max_it=params.max_it, n_print=params.n_print,
    )


def _as_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve(params: Params,
          state: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
          t0: float = 0.0) -> SerialResult:
    """Full native integration `while t < T`; state arrays are float64
    (i_max+2, j_max+2), zero-initialized if not given."""
    lib = _load()
    shape = params.shape
    if state is None:
        u = np.zeros(shape)
        v = np.zeros(shape)
        p = np.zeros(shape)
    else:
        u, v, p = (np.ascontiguousarray(x, dtype=np.float64) for x in state)
        if u.shape != shape:
            raise ValueError(f"state shape {u.shape} != config shape {shape}")
    stats = _CStats(t=t0)
    rc = lib.nsp_solve(ctypes.byref(_c_params(params)), _as_ptr(u), _as_ptr(v),
                       _as_ptr(p), ctypes.byref(stats))
    if rc != 0:
        raise RuntimeError(f"nsp_solve failed with code {rc}")
    return SerialResult(
        u=u, v=v, p=p, t=stats.t, steps=stats.steps,
        total_sor_iterations=stats.total_sor_iters,
        sor_failures=stats.sor_failures, sor_seconds=stats.sor_seconds,
    )


def sor(params: Params, p: np.ndarray,
        rhs: np.ndarray) -> Tuple[int, np.ndarray]:
    """Native lexicographic SOR on a prepared system.  Returns
    (sweeps, solved_p); sweeps is negative if max_it was exceeded.  The
    caller's array is never mutated — a float64 copy is always taken."""
    lib = _load()
    p = np.array(p, dtype=np.float64, order="C", copy=True)
    rhs = np.ascontiguousarray(rhs, dtype=np.float64)
    sweeps = lib.nsp_sor(ctypes.byref(_c_params(params)), _as_ptr(p),
                         _as_ptr(rhs), None)
    return int(sweeps), p
