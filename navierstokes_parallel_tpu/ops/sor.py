"""Pressure-Poisson solvers: red-black SOR (and Jacobi fallback), on-device.

TPU-native redesign of the reference's two SOR implementations:
  * serial lexicographic Gauss-Seidel SOR (src/serial/integration.c:129-173)
  * CUDA red-black shared-memory SOR (src/parallel/main.cu:384-511, driver
    main.cu:656-726)

Lexicographic Gauss-Seidel is inherently sequential, so like the CUDA port we
use red-black (checkerboard) ordering: two half-sweeps per iteration, each a
fully-vectorized masked Jacobi update.  The reference's host-driven loop pays
6 kernel launches + 6 device syncs + one 8-byte D2H copy *per iteration*
(main.cu:684-713); here the entire solve — half-sweeps, Neumann ghost fill,
residual, L2 norm, and the convergence test — lives inside one
`lax.while_loop`, so a whole pressure solve is a single XLA computation with
zero host round-trips.

Convergence contract (must match serial semantics, integration.c:135,164):
stop when  L2(residual) <= eps * (||p_0|| + 1.5)  where ||p_0|| is the L2 norm
of p at solver entry.  (The reference's parallel fork uses +0.01 instead of
+1.5 — a fork divergence noted in SURVEY.md; we follow serial.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Params
from .stencils import l2_norm

# The serial reference's convergence-threshold offset (integration.c:164).
NORM_OFFSET = 1.5


class SORResult(NamedTuple):
    p: jax.Array           # solved pressure field (with ghosts)
    iterations: jax.Array  # scalar int32: sweeps performed
    res_norm: jax.Array    # scalar: final L2 residual norm
    converged: jax.Array   # scalar bool


def ghost_fill(p: jax.Array) -> jax.Array:
    """Homogeneous Neumann ghost update: copy the adjacent interior strip.

    Reference integration.c:138-146 (sides only; corners are never read by
    the 5-point stencil).
    """
    p = p.at[0, 1:-1].set(p[1, 1:-1])
    p = p.at[-1, 1:-1].set(p[-2, 1:-1])
    p = p.at[1:-1, 0].set(p[1:-1, 1])
    p = p.at[1:-1, -1].set(p[1:-1, -2])
    return p


def _checkerboard(shape: Tuple[int, int], color: int) -> jax.Array:
    """Boolean mask over the interior: True where (i + j) % 2 == color,
    with i, j the 1-based global indices (matches main.cu:490)."""
    ii = lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = lax.broadcasted_iota(jnp.int32, shape, 1)
    return (ii + jj) % 2 == color


def _half_sweep(p, rhs_int, mask, omega, dx2_inv, dy2_inv):
    """One masked SOR half-sweep over the interior (one checkerboard color)."""
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    p_int = p[1:-1, 1:-1]
    neighbors = (p[2:, 1:-1] + p[:-2, 1:-1]) * dx2_inv + (
        p[1:-1, 2:] + p[1:-1, :-2]
    ) * dy2_inv
    p_new = (1.0 - omega) * p_int + coef * (neighbors - rhs_int)
    return p.at[1:-1, 1:-1].set(jnp.where(mask, p_new, p_int))


def residual(p: jax.Array, rhs_int: jax.Array, dx2_inv, dy2_inv) -> jax.Array:
    """Pointwise Poisson residual on the interior (integration.c:156-160)."""
    return (
        (p[2:, 1:-1] - 2.0 * p[1:-1, 1:-1] + p[:-2, 1:-1]) * dx2_inv
        + (p[1:-1, 2:] - 2.0 * p[1:-1, 1:-1] + p[1:-1, :-2]) * dy2_inv
        - rhs_int
    )


def rb_sor_iteration(p, rhs_int, omega, dx2_inv, dy2_inv, red_mask, black_mask):
    """One full red-black iteration: ghost fill + red sweep + ghost fill +
    black sweep (structure of main.cu:684-698)."""
    p = ghost_fill(p)
    p = _half_sweep(p, rhs_int, red_mask, omega, dx2_inv, dy2_inv)
    p = ghost_fill(p)
    p = _half_sweep(p, rhs_int, black_mask, omega, dx2_inv, dy2_inv)
    return p


def jacobi_iteration(p, rhs_int, omega, dx2_inv, dy2_inv):
    """One damped-Jacobi iteration (pluggable fallback solver)."""
    p = ghost_fill(p)
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    p_int = p[1:-1, 1:-1]
    neighbors = (p[2:, 1:-1] + p[:-2, 1:-1]) * dx2_inv + (
        p[1:-1, 2:] + p[1:-1, :-2]
    ) * dy2_inv
    return p.at[1:-1, 1:-1].set((1.0 - omega) * p_int + coef * (neighbors - rhs_int))


def solve_pressure(
    p: jax.Array,
    rhs: jax.Array,
    params: Params,
    *,
    method: str = "rb_sor",
) -> SORResult:
    """Iterate until L2(res) <= eps*(||p0|| + 1.5) or max_it sweeps.

    Fully on-device: the convergence scalar never leaves the chip (vs the
    reference's per-iteration cudaMemcpy + host test, main.cu:710-713).

    Precision policy: in float64 this is the direct reference algorithm.  In
    float32 (the TPU-native dtype) the discrete Laplacian amplifies p's
    storage rounding by ~8/dx^2, putting an ulp(p)*8/dx^2 noise floor on the
    achievable residual that exceeds the reference's stopping threshold for
    grids >= ~64^2.  We therefore use *mixed-precision iterative refinement*
    (see `_solve_pressure_refined`): all sweeps stay in f32 but operate on the
    correction delta against an f64 master pressure that is re-baselined (and
    convergence-checked) every `sor_refine_every` sweeps.  Because SOR is a
    stationary linear iteration, the refined iteration is mathematically
    identical to plain SOR — refinement only stops floating-point error from
    accumulating in the large-magnitude iterate.
    """
    if (
        p.dtype == jnp.float32
        and params.sor_refine_every > 0
        and jax.config.jax_enable_x64
    ):
        return _solve_pressure_refined(p, rhs, params, method=method)
    return _solve_pressure_direct(p, rhs, params, method=method)


def _make_iteration(method, rhs_int, omega, dx2_inv, dy2_inv, red_mask, black_mask):
    if method == "rb_sor":
        def iteration(p):
            return rb_sor_iteration(
                p, rhs_int, omega, dx2_inv, dy2_inv, red_mask, black_mask
            )
    elif method == "jacobi":
        def iteration(p):
            return jacobi_iteration(p, rhs_int, omega, dx2_inv, dy2_inv)
    else:
        raise ValueError(f"unknown pressure solver method {method!r}")
    return iteration


def _solve_pressure_direct(p, rhs, params, *, method):
    """Single-precision-domain solve with the residual check every sweep
    (exact serial semantics, integration.c:136-169)."""
    i_max, j_max = params.i_max, params.j_max
    dtype = p.dtype
    dx2_inv = jnp.asarray(1.0 / (params.dx * params.dx), dtype)
    dy2_inv = jnp.asarray(1.0 / (params.dy * params.dy), dtype)
    omega = jnp.asarray(params.omega, dtype)
    rhs_int = rhs[1:-1, 1:-1]

    red_mask = _checkerboard((i_max, j_max), 0)
    black_mask = _checkerboard((i_max, j_max), 1)

    norm_p0 = l2_norm(p[1:-1, 1:-1], i_max, j_max)
    threshold = params.epsilon * (norm_p0 + NORM_OFFSET)

    iteration = _make_iteration(
        method, rhs_int, omega, dx2_inv, dy2_inv, red_mask, black_mask
    )

    def cond(carry):
        p, it, res_norm = carry
        return jnp.logical_and(it < params.max_it, res_norm > threshold)

    def body(carry):
        p, it, _ = carry
        p = iteration(p)
        res_norm = l2_norm(residual(p, rhs_int, dx2_inv, dy2_inv), i_max, j_max)
        return p, it + 1, res_norm

    init = (p, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
    p, it, res_norm = lax.while_loop(cond, body, init)
    return SORResult(p=p, iterations=it, res_norm=res_norm,
                     converged=res_norm <= threshold)


def _solve_pressure_refined(p, rhs, params, *, method):
    """Mixed-precision iterative refinement around f32 SOR sweeps.

    Outer loop (f64, once per K sweeps): defect r = A p - RHS, L2 norm,
    convergence test against the reference threshold, p += delta.
    Inner loop (f32): K red-black SOR sweeps on A delta = -r from delta = 0.
    In exact arithmetic this IS plain SOR (stationary iteration); in floating
    point the f32 sweeps only ever handle the small-scale correction, so the
    ulp(p)-amplification floor never appears.
    """
    i_max, j_max = params.i_max, params.j_max
    K = params.sor_refine_every
    f64, f32 = jnp.float64, jnp.float32

    dx2_inv64 = jnp.asarray(1.0 / (params.dx * params.dx), f64)
    dy2_inv64 = jnp.asarray(1.0 / (params.dy * params.dy), f64)
    dx2_inv32 = dx2_inv64.astype(f32)
    dy2_inv32 = dy2_inv64.astype(f32)
    omega32 = jnp.asarray(params.omega, f32)

    red_mask = _checkerboard((i_max, j_max), 0)
    black_mask = _checkerboard((i_max, j_max), 1)

    p64 = p.astype(f64)
    rhs_int64 = rhs[1:-1, 1:-1].astype(f64)

    norm_p0 = l2_norm(p64[1:-1, 1:-1], i_max, j_max)
    threshold = params.epsilon * (norm_p0 + NORM_OFFSET)

    def inner_sweeps(neg_res32, n_sweeps):
        """n_sweeps f32 red-black sweeps on A delta = -r, delta0 = 0."""
        delta0 = jnp.zeros(p.shape, f32)
        iteration = _make_iteration(
            method, neg_res32, omega32, dx2_inv32, dy2_inv32, red_mask, black_mask
        )
        return lax.fori_loop(0, n_sweeps, lambda _, d: iteration(d), delta0)

    def cond(carry):
        _, _, it, res_norm = carry
        return jnp.logical_and(it < params.max_it, res_norm > threshold)

    def body(carry):
        p64, r64, it, _ = carry
        n_inner = jnp.minimum(K, params.max_it - it)
        delta = inner_sweeps(-r64.astype(f32), n_inner)
        p64 = p64.at[1:-1, 1:-1].add(delta[1:-1, 1:-1].astype(f64))
        r64 = residual(ghost_fill(p64), rhs_int64, dx2_inv64, dy2_inv64)
        res_norm = l2_norm(r64, i_max, j_max)
        return p64, r64, it + n_inner, res_norm

    r64_0 = residual(ghost_fill(p64), rhs_int64, dx2_inv64, dy2_inv64)
    init = (p64, r64_0, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, f64))
    p64, _, it, res_norm = lax.while_loop(cond, body, init)
    p_out = ghost_fill(p64).astype(p.dtype)
    return SORResult(
        p=p_out,
        iterations=it,
        res_norm=res_norm.astype(p.dtype),
        converged=res_norm <= threshold,
    )
