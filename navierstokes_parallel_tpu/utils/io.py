"""Field text I/O — byte-format parity with the reference.

Writes u/v/p text grids in exactly the reference's `output()` format
(src/serial/io.c:61-120): per field a 3-line header (t, a, b, each "%.5f"),
then rows of "%.5f "-formatted values, outer loop over j (so a text row is a
fixed-j slice), inner over i.  Quirks reproduced: the u file has i_max+1
columns, the v file has j_max+1 data rows followed by one empty line, the p
file is the full (i_max+2) x (j_max+2) padded grid.

This keeps the reference's downstream tooling (plot_ghia.py, plot_field.py,
the notebook comparator) working unchanged against our outputs.
"""

from __future__ import annotations

import ctypes
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Tuple

import numpy as np

_NATIVE_IO = None  # lazily loaded libnsp_io.so handle; False = unavailable
_NATIVE_IO_LOCK = threading.Lock()


def _native_io():
    """ctypes handle to the native writer (csrc/nsp_io.c), built on demand
    like the serial C backend; False when the toolchain/source is absent
    (wheel installs) — callers fall back to the Python formatter.  The lock
    matters: output() calls this from three pool threads, and two concurrent
    `make`s racing on the same .so would hand CDLL a half-written ELF."""
    global _NATIVE_IO
    with _NATIVE_IO_LOCK:
        if _NATIVE_IO is not None:
            return _NATIVE_IO
        try:
            root = os.path.abspath(
                os.path.join(os.path.dirname(__file__), "..", ".."))
            lib_path = os.path.join(root, "build", "libnsp_io.so")
            src = os.path.join(root, "csrc", "nsp_io.c")
            if not os.path.exists(lib_path) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(lib_path)
            ):
                import subprocess

                subprocess.run(["make", "-C", os.path.join(root, "csrc")],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(lib_path)
            lib.nsp_write_grid.restype = ctypes.c_int
            lib.nsp_write_grid.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ]
            _NATIVE_IO = lib
        except Exception:
            _NATIVE_IO = False
        return _NATIVE_IO


def _write_grid_py(path: str, arr: np.ndarray, t: float, a: float, b: float,
                   n_cols: int, n_rows: int) -> None:
    """Pure-Python formatter (the oracle for the native writer's byte
    parity, tests/test_io.py)."""
    with open(path, "w") as fh:
        fh.write(f"{t:.5f}\n{a:.5f}\n{b:.5f}\n")
        total_rows = arr.shape[1]
        for j in range(total_rows):
            if j < n_rows:
                row = arr[:n_cols, j]
                fh.write(" ".join(f"{val:.5f}" for val in row) + " \n")
            else:
                fh.write("\n")


def _write_grid(path: str, arr: np.ndarray, t: float, a: float, b: float,
                n_cols: int, n_rows: int) -> None:
    """arr is indexed [i, j]; file rows are j-slices (io.c:102-112).
    Native fast path (>15x: csrc/nsp_io.c) with Python fallback."""
    lib = _native_io()
    if lib:
        arr64 = np.ascontiguousarray(arr, dtype=np.float64)
        rc = lib.nsp_write_grid(
            path.encode(), arr64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            arr64.shape[0], arr64.shape[1], n_cols, n_rows,
            float(t), float(a), float(b))
        if rc == 0:
            return
    _write_grid_py(path, arr, t, a, b, n_cols, n_rows)


def output(u, v, p, t: float, a: float, b: float, prefix: str,
           verbose: bool = True, temperature=None) -> None:
    """Write `<prefix>_{u,v,p}.txt` (reference io.c:61-120).  The three
    files are written concurrently — ctypes releases the GIL, so the native
    formatters genuinely overlap.  `temperature` (problem 5) adds a
    cell-centered `<prefix>_temp.txt` in the same grid format as p."""
    u = np.asarray(u)
    v = np.asarray(v)
    p = np.asarray(p)
    i_max = p.shape[0] - 2
    j_max = p.shape[1] - 2

    d = os.path.dirname(prefix)
    if d:
        os.makedirs(d, exist_ok=True)

    jobs = (
        (f"{prefix}_u.txt", u, i_max + 1, j_max + 2),
        (f"{prefix}_v.txt", v, i_max + 2, j_max + 1),
        (f"{prefix}_p.txt", p, i_max + 2, j_max + 2),
    )
    if temperature is not None:
        jobs += ((f"{prefix}_temp.txt", np.asarray(temperature),
                  i_max + 2, j_max + 2),)
    with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
        futs = [pool.submit(_write_grid, path, arr, t, a, b, nc, nr)
                for path, arr, nc, nr in jobs]
        for f in futs:
            f.result()
    if verbose:
        print("Output created!")


def read_field(path: str) -> Tuple[float, float, float, np.ndarray]:
    """Read a field file back; returns (t, a, b, array indexed [i, j])."""
    with open(path, "r") as fh:
        t = float(fh.readline())
        a = float(fh.readline())
        b = float(fh.readline())
        rows = []
        for line in fh:
            if not line.isspace():
                # C-speed parsing that still RAISES on a corrupt token
                # (np.fromstring(sep=...) is deprecated and silently
                # truncates the row at the first garbage value).
                rows.append(np.array(line.split(), dtype=np.float64))
    # File rows are j-slices with i varying along the row -> transpose.
    return t, a, b, np.array(rows).T


def tolerance_errors(a, b):
    """The reference notebook's comparator metric on arrays: elementwise
    relative error where |x| > 1, absolute error otherwise
    (colab-runner.ipynb compare_outputs_with_tolerance).  Returns the error
    array; compare its max against the tolerance (1e-4 in the contract).
    This is the single implementation — the parity script and the test
    suite both use it."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    big = (np.abs(a) > 1.0) | (np.abs(b) > 1.0)
    denom = np.maximum(np.abs(a), np.abs(b))
    rel = np.abs(a - b) / np.where(denom == 0, 1.0, denom)
    return np.where(big, rel, np.abs(a - b))


def compare_outputs_with_tolerance(path_a: str, path_b: str,
                                   tol: float = 1e-4) -> bool:
    """File-based parity check in the notebook's contract."""
    with open(path_a) as fa, open(path_b) as fb:
        lines_a, lines_b = fa.readlines(), fb.readlines()
    if len(lines_a) != len(lines_b):
        return False
    for la, lb in zip(lines_a, lines_b):
        ta, tb = la.split(), lb.split()
        if len(ta) != len(tb):
            return False
        if ta and np.max(
            tolerance_errors([float(x) for x in ta], [float(x) for x in tb])
        ) > tol:
            return False
    return True
