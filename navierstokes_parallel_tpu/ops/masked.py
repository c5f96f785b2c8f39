"""Masked pressure-Poisson solvers for flag-field obstacle domains.

The obstacle-free solvers (ops/sor.py) impose the homogeneous-Neumann wall
condition by ghost-strip copies — a trick that cannot express an arbitrary
interior geometry.  Here the SAME operator is written in neighbor-weight +
self-coefficient form:

    (A p)_ij = sum_d w_d (p_d - p_ij),   w_d = 1/dx^2 (or 1/dy^2) if the
                                         d-neighbor is fluid, else 0

which drops solid (and ghost) neighbors per cell.  On an obstacle-free
domain this is algebraically identical to the ghost-fill residual (the
copied strip makes each wall term vanish), so the convergence contract
carries over unchanged: L2(res) <= eps * (||p0|| + 1.5), with the L2
normalized by the FLUID cell count (the reference normalizes by the full
cell count, integration.c:115; there is no reference semantics for
obstacles, and the fluid count makes the threshold geometry-independent —
a half-blocked cavity thresholds exactly like the half-height cavity, see
tests/test_obstacles.py).

Everything is static masks + fused elementwise passes: XLA folds the
weights in as constants, there is no gather/scatter, and the mixed-
precision refinement outer (f64 master / f32 correction sweeps) is the
same load-bearing structure as ops/sor.py's.

Methods: "rb_sor" (masked red-black sweeps as the refinement inner) and
"mg" (masked geometric multigrid V(2,2): coarse fluid = any-child-fluid,
level weights rebuilt per level, masked transfers).  fft (separable
transforms cannot see interior masks), cg and the Pallas kernels reject
obstacle runs in ops/sor.py.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import Params
from . import obstacles
from .sor import NORM_OFFSET, SORResult, _checkerboard


class _Weights(NamedTuple):
    """Interior-shaped (i_max, j_max) float64 numpy constants."""

    w_e: np.ndarray
    w_w: np.ndarray
    w_n: np.ndarray
    w_s: np.ndarray
    diag: np.ndarray       # sum of the four weights, >= 1 dummy on solid
    fluid: np.ndarray      # bool
    n_fluid: int


def _build_weights(fluid_padded: np.ndarray, dx2_inv: float,
                   dy2_inv: float, au: np.ndarray = None,
                   av: np.ndarray = None) -> _Weights:
    """Neighbor weights from the flag field; with face-fraction arrays
    `au`/`av` (padded, ops/obstacles.py::Apertures) each fluid-fluid weight
    is additionally scaled by its open fraction — the cut-cell closure.
    The staircase booleans still gate every coupling, so solid neighbors
    and ghost cells never enter regardless of their face fraction."""
    fl = fluid_padded
    interior = fl[1:-1, 1:-1]
    w_e = np.where(interior & fl[2:, 1:-1], dx2_inv, 0.0)
    w_w = np.where(interior & fl[:-2, 1:-1], dx2_inv, 0.0)
    w_n = np.where(interior & fl[1:-1, 2:], dy2_inv, 0.0)
    w_s = np.where(interior & fl[1:-1, :-2], dy2_inv, 0.0)
    if au is not None:
        w_e = w_e * au[1:-1, 1:-1]
        w_w = w_w * au[:-2, 1:-1]
        w_n = w_n * av[1:-1, 1:-1]
        w_s = w_s * av[1:-1, :-2]
    diag = w_e + w_w + w_n + w_s
    diag = np.where(diag > 0.0, diag, 1.0)  # inert on solid cells
    return _Weights(w_e=w_e, w_w=w_w, w_n=w_n, w_s=w_s, diag=diag,
                    fluid=interior.copy(), n_fluid=int(interior.sum()))


@functools.lru_cache(maxsize=32)
def _weights(params: Params) -> _Weights:
    fl = obstacles.masks(params).fluid
    if obstacles.aperture_active(params):
        ap = obstacles.apertures(params)
        return _build_weights(fl, 1.0 / (params.dx * params.dx),
                              1.0 / (params.dy * params.dy), ap.au, ap.av)
    return _build_weights(fl, 1.0 / (params.dx * params.dx),
                          1.0 / (params.dy * params.dy))


def _nb_sum(p, w, dtype):
    """sum_d w_d * p_d on the interior of a padded array."""
    return (p[2:, 1:-1] * jnp.asarray(w.w_e, dtype)
            + p[:-2, 1:-1] * jnp.asarray(w.w_w, dtype)
            + p[1:-1, 2:] * jnp.asarray(w.w_n, dtype)
            + p[1:-1, :-2] * jnp.asarray(w.w_s, dtype))


def masked_residual(p, rhs_int, w: _Weights):
    """(A p - rhs) on fluid cells, 0 on solid.  `p` padded, `rhs_int`
    interior-shaped."""
    dtype = p.dtype
    r = (_nb_sum(p, w, dtype) - jnp.asarray(w.diag, dtype) * p[1:-1, 1:-1]
         - rhs_int)
    return jnp.where(jnp.asarray(w.fluid), r, jnp.zeros_like(r))


def _masked_half_sweep(p, rhs_int, color_fluid, omega, w: _Weights):
    dtype = p.dtype
    p_int = p[1:-1, 1:-1]
    p_new = ((1.0 - omega) * p_int
             + (omega / jnp.asarray(w.diag, dtype))
             * (_nb_sum(p, w, dtype) - rhs_int))
    return p.at[1:-1, 1:-1].set(jnp.where(color_fluid, p_new, p_int))


def masked_rb_iteration(p, rhs_int, omega, w: _Weights, red, black):
    """One masked red-black SOR iteration.  No ghost fill is needed: the
    weights already zero every ghost/solid neighbor term."""
    p = _masked_half_sweep(p, rhs_int, red, omega, w)
    return _masked_half_sweep(p, rhs_int, black, omega, w)


def _color_masks(params: Params, w: _Weights):
    shape = (params.i_max, params.j_max)
    fluid = jnp.asarray(w.fluid)
    red = _checkerboard(shape, 0) & fluid
    black = _checkerboard(shape, 1) & fluid
    return red, black


def _l2_fluid(r_int, w: _Weights):
    return jnp.sqrt(jnp.sum(r_int * r_int) / w.n_fluid)


# ---------------------------------------------------------------------------
# Masked multigrid: V(2,2) on the neighbor-weight operator per level.
# ---------------------------------------------------------------------------


class _MaskedLevel(NamedTuple):
    weights: _Weights
    red: np.ndarray        # interior bool: red fluid cells
    black: np.ndarray
    shape: Tuple[int, int]  # padded


@functools.lru_cache(maxsize=32)
def _masked_levels(params: Params, min_cells: int = 8):
    """Coarsen geometry by 2: coarse cell fluid iff ANY child is fluid
    (keeps narrow channels open so the coarse correction can travel), with
    weights rebuilt from the coarse mask at the coarse spacing.  In
    aperture mode the face fractions coarsen geometrically alongside —
    a coarse face's open fraction is the mean of its two children's — so
    every level smooths the cut-cell operator, not the staircase one."""
    fl = obstacles.masks(params).fluid
    ni, nj = params.i_max, params.j_max
    dx2_inv = 1.0 / (params.dx * params.dx)
    dy2_inv = 1.0 / (params.dy * params.dy)
    if obstacles.aperture_active(params):
        ap = obstacles.apertures(params)
        au, av = ap.au, ap.av
    else:
        au = av = None
    levels: List[_MaskedLevel] = []
    while True:
        w = _build_weights(fl, dx2_inv, dy2_inv, au, av)
        ii, jj = np.meshgrid(np.arange(1, ni + 1), np.arange(1, nj + 1),
                             indexing="ij")
        checker = (ii + jj) % 2 == 0
        levels.append(_MaskedLevel(
            weights=w, red=checker & w.fluid, black=(~checker) & w.fluid,
            shape=(ni + 2, nj + 2)))
        if ni % 2 or nj % 2 or ni // 2 < min_cells or nj // 2 < min_cells:
            break
        blocks = fl[1:-1, 1:-1].reshape(ni // 2, 2, nj // 2, 2)
        coarse = blocks.any(axis=(1, 3))
        ni_c, nj_c = ni // 2, nj // 2
        if au is not None:
            # Coarse east face of coarse cell (I, J) = fine east faces of
            # fine cell 2I at rows 2J-1 and 2J (1-based padded indices).
            au_c = np.zeros((ni_c + 2, nj_c + 2))
            au_c[1 : ni_c + 1, 1 : nj_c + 1] = 0.5 * (
                au[2 : ni + 1 : 2, 1 : nj : 2]
                + au[2 : ni + 1 : 2, 2 : nj + 1 : 2])
            av_c = np.zeros((ni_c + 2, nj_c + 2))
            av_c[1 : ni_c + 1, 1 : nj_c + 1] = 0.5 * (
                av[1 : ni : 2, 2 : nj + 1 : 2]
                + av[2 : ni + 1 : 2, 2 : nj + 1 : 2])
            au, av = au_c, av_c
        ni, nj = ni_c, nj_c
        dx2_inv /= 4.0
        dy2_inv /= 4.0
        fl = np.zeros((ni + 2, nj + 2), bool)
        fl[1:-1, 1:-1] = coarse
    return tuple(levels)


def _smooth_masked(p, rhs_int, lvl: _MaskedLevel, n_sweeps: int):
    red = jnp.asarray(lvl.red)
    black = jnp.asarray(lvl.black)

    def sweep(_, p):
        return masked_rb_iteration(p, rhs_int, 1.0, lvl.weights, red, black)

    return lax.fori_loop(0, n_sweeps, sweep, p)


def _v_cycle_masked(p, rhs_int, levels, depth=0, nu1=2, nu2=2,
                    coarse_sweeps=32):
    lvl = levels[depth]
    if depth == len(levels) - 1:
        return _smooth_masked(p, rhs_int, lvl, coarse_sweeps)
    p = _smooth_masked(p, rhs_int, lvl, nu1)
    r = -masked_residual(p, rhs_int, lvl.weights)
    # restrict: 2x2 full weighting, then zero on coarse-solid cells
    coarse = levels[depth + 1]
    ni_c, nj_c = coarse.shape[0] - 2, coarse.shape[1] - 2
    avg = 0.25 * lax.reduce_window(r, 0.0, lax.add, (2, 2), (2, 2), "VALID")
    r_c = jnp.where(jnp.asarray(coarse.weights.fluid), avg,
                    jnp.zeros_like(avg))
    e_c = jnp.zeros((ni_c + 2, nj_c + 2), p.dtype)
    e_c = _v_cycle_masked(e_c, r_c, levels, depth + 1, nu1, nu2,
                          coarse_sweeps)
    # prolong: constant injection, zeroed on fine-solid cells
    up = jnp.repeat(jnp.repeat(e_c[1:-1, 1:-1], 2, axis=0), 2, axis=1)
    up = jnp.where(jnp.asarray(lvl.weights.fluid), up, jnp.zeros_like(up))
    p = p.at[1:-1, 1:-1].add(up)
    return _smooth_masked(p, rhs_int, lvl, nu2)


# ---------------------------------------------------------------------------
# The mixed-precision refinement outer (structure of ops/sor.py's).
# ---------------------------------------------------------------------------


def solve_pressure_masked(p: jax.Array, rhs: jax.Array, params: Params,
                          method: str = "rb_sor") -> SORResult:
    """Masked analogue of sor._solve_pressure_refined: f64 master + exact
    f64 defect check against the masked operator; f32 correction
    iterations (K red-black sweeps, or `mg_cycles_per_outer` masked
    V-cycles) between checks.  Requires x64 (the compensated outer is not
    wired for obstacle runs yet — measure demand first)."""
    if not jax.config.jax_enable_x64:
        raise ValueError("obstacle runs need jax x64 for the f64 refinement "
                         "master (CLI/bench enable it)")
    f64, f32 = jnp.float64, jnp.float32
    w64 = _weights(params)
    omega32 = jnp.asarray(params.omega, f32)
    red, black = _color_masks(params, w64)

    if method == "rb_sor":
        K = max(1, params.sor_refine_every)

        def inner(neg_r32, n_inner):
            def sweep(_, d):
                return masked_rb_iteration(d, neg_r32, omega32, w64, red,
                                           black)
            return lax.fori_loop(
                0, n_inner, sweep, jnp.zeros(params.shape, f32))
    elif method == "mg":
        K = max(1, params.mg_cycles_per_outer)
        levels = _masked_levels(params)

        def inner(neg_r32, n_inner):
            def cycle(_, d):
                return _v_cycle_masked(d, neg_r32, levels)
            return lax.fori_loop(
                0, n_inner, cycle, jnp.zeros(params.shape, f32))
    else:
        raise ValueError(
            f"method {method!r} does not support obstacle domains — use "
            "rb_sor or mg (fft transforms are separable, cg/pallas kernels "
            "are unmasked)")

    p64 = p.astype(f64)
    rhs_int64 = jnp.where(jnp.asarray(w64.fluid),
                          rhs[1:-1, 1:-1].astype(f64), 0.0)
    norm_p0 = _l2_fluid(jnp.where(jnp.asarray(w64.fluid),
                                  p64[1:-1, 1:-1], 0.0), w64)
    threshold = params.epsilon * (norm_p0 + NORM_OFFSET)

    deflate = params.problem == 3

    def defect(p64):
        r = masked_residual(p64, rhs_int64, w64)
        if deflate:
            # Constant-mode deflation over FLUID cells (see ops/sor.py) —
            # the mean must exclude the inert solid zeros.
            r = r - jnp.where(jnp.asarray(w64.fluid),
                              jnp.sum(r) / w64.n_fluid, 0.0)
        return r

    def cond(carry):
        _, _, it, res_norm = carry
        return jnp.logical_and(it < params.max_it, res_norm > threshold)

    def body(carry):
        p64, r64, it, _ = carry
        n_inner = jnp.minimum(K, params.max_it - it)
        delta = inner(-r64.astype(f32), n_inner)
        p64 = p64.at[1:-1, 1:-1].add(delta[1:-1, 1:-1].astype(f64))
        r64 = defect(p64)
        return p64, r64, it + n_inner, _l2_fluid(r64, w64)

    r64_0 = defect(p64)
    init = (p64, r64_0, jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, f64))
    p64, _, it, res_norm = lax.while_loop(cond, body, init)
    return SORResult(
        p=p64.astype(p.dtype),
        iterations=it,
        res_norm=res_norm.astype(p.dtype),
        converged=res_norm <= threshold,
    )
