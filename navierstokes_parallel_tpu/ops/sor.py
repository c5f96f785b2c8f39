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


def _checkerboard(shape: Tuple[int, int], color: int, offset=0) -> jax.Array:
    """Boolean mask over the interior: True where (i + j) % 2 == color, with
    i, j the 1-based *global* indices (matches main.cu:490).  For a local
    shard whose interior origin is global (oi, oj), pass offset = oi + oj
    (may be a traced scalar) so the checkerboard stays globally consistent
    across shard boundaries."""
    ii = lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = lax.broadcasted_iota(jnp.int32, shape, 1)
    return (ii + jj + offset) % 2 == color


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


def rb_sor_iteration(p, rhs_int, omega, dx2_inv, dy2_inv, red_mask, black_mask,
                     ghost_fn=ghost_fill):
    """One full red-black iteration: ghost fill + red sweep + ghost fill +
    black sweep (structure of main.cu:684-698).  `ghost_fn` refreshes the
    ghost/halo ring — Neumann copy on one chip, ppermute halo exchange (with
    Neumann closure at the physical boundary) when sharded."""
    p = ghost_fn(p)
    p = _half_sweep(p, rhs_int, red_mask, omega, dx2_inv, dy2_inv)
    p = ghost_fn(p)
    p = _half_sweep(p, rhs_int, black_mask, omega, dx2_inv, dy2_inv)
    return p


def jacobi_iteration(p, rhs_int, omega, dx2_inv, dy2_inv, ghost_fn=ghost_fill):
    """One damped-Jacobi iteration (pluggable fallback solver)."""
    p = ghost_fn(p)
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    p_int = p[1:-1, 1:-1]
    neighbors = (p[2:, 1:-1] + p[:-2, 1:-1]) * dx2_inv + (
        p[1:-1, 2:] + p[1:-1, :-2]
    ) * dy2_inv
    return p.at[1:-1, 1:-1].set((1.0 - omega) * p_int + coef * (neighbors - rhs_int))


def default_method(params: Params) -> str:
    """Best pressure solver for the current backend: the Pallas kernels on
    TPU (whole-grid-in-VMEM when it fits, strip-tiled otherwise), the
    fused-jnp red-black path elsewhere (CPU, sharded local blocks).
    Obstacle domains use the masked jnp path (ops/masked.py) — the Pallas
    kernels carry no fluid masks."""
    if params.obstacles:
        return "rb_sor"
    if jax.default_backend() == "tpu":
        return "pallas_sor"
    return "rb_sor"


def solve_pressure(
    p: jax.Array,
    rhs: jax.Array,
    params: Params,
    *,
    method: str = "rb_sor",
    **hooks,
) -> SORResult:
    """Iterate until L2(res) <= eps*(||p0|| + 1.5) or max_it sweeps.

    `hooks` (ghost_fn, l2_fn, parity) adapt the solver to run on a local
    shard inside `shard_map` — see parallel/sharded.py.

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
    # Popped (not read) so the remaining hooks forward cleanly to the
    # direct/refined solvers, which take mean_fn as an explicit kwarg.
    mean_fn = hooks.pop("mean_fn", None) or jnp.mean
    if params.obstacles:
        # Flag-field obstacle domains: the ghost-strip Neumann trick cannot
        # express interior geometry — dispatch to the neighbor-weight
        # masked solvers (ops/masked.py; rb_sor and mg only).
        if hooks:
            raise ValueError("obstacle domains are single-chip/gspmd only "
                             "(the shard_map halo machinery is unmasked)")
        from . import masked

        return masked.solve_pressure_masked(p, rhs, params, method=method)
    if params.problem == 3:
        # Outflow problems: the BC-level flux balance (boundary.py
        # apply_channel_bcs) cancels the in/outflow fluxes only to f32
        # roundoff, leaving a constant-mode (Neumann null space) component
        # in rhs that no iteration can remove — at fine grids its floor
        # crosses the eps*(||p0||+1.5) contract (measured: 59 max_it hits
        # at 64x32 without this).  Deflate it by the orthogonal projection
        # onto the compatible subspace; gradients (all the projection ever
        # uses) are unchanged.  The enclosed problems 1-2 are left
        # untouched for bit-parity with the reference.  Sharded callers
        # pass a psum'd mean_fn hook — a per-block local mean would
        # subtract a DIFFERENT constant per shard, changing the problem.
        interior = rhs[1:-1, 1:-1]
        rhs = rhs.at[1:-1, 1:-1].set(interior - mean_fn(interior))
    if method == "jacobi" and params.omega > 1.0:
        # Damped Jacobi diverges for omega > 1 (spectral radius
        # |1 - omega + omega*mu| with mu in (-1, 1)); clamp rather than let
        # every shipped omega=1.7 config blow up — and say so.
        import warnings

        warnings.warn(
            f"method='jacobi' diverges for omega={params.omega} > 1; "
            "clamping to 0.8 (damped Jacobi)", stacklevel=2,
        )
        params = params.replace(omega=0.8)
    if method == "cg":
        # Conjugate-gradient inner (restarted every K iterations by the
        # refinement outer).  The Neumann Laplacian is symmetric negative
        # semi-definite; CG runs on B = -A.  Slower than multigrid but a
        # robust Krylov fallback; `iterations` counts CG steps.
        if hooks:
            raise ValueError("cg is single-chip only (got shard hooks)")
        if not jax.config.jax_enable_x64 and \
                params.outer_precision != "compensated":
            raise ValueError("cg requires x64 for the f64 master (or "
                             "outer_precision='compensated')")
        # K=0 ('refinement off') would make n_inner=0 and spin forever.
        return _solve_pressure_refined(
            p, rhs, params.replace(sor_refine_every=max(1, params.sor_refine_every)),
            method="rb_sor", inner="cg")
    if method == "mg":
        # Geometric multigrid V-cycles as the refinement inner stage
        # (ops/mg.py): `mg_cycles_per_outer` cycles per f64 defect check
        # (default 1); `iterations` counts V-cycles.  Same convergence
        # contract, ~1000x fewer sweeps on large grids.  Single-chip only.
        if hooks:
            raise ValueError("mg is single-chip only (got shard hooks)")
        if not jax.config.jax_enable_x64 and \
                params.outer_precision != "compensated":
            raise ValueError("mg requires x64 for the f64 master (or "
                             "outer_precision='compensated')")
        return _solve_pressure_refined(
            p, rhs,
            params.replace(
                sor_refine_every=max(1, params.mg_cycles_per_outer)),
            method="rb_sor", inner="mg",
        )
    if method == "fft":
        # Direct DCT-II spectral solve on the MXU (ops/fft.py): one
        # transform-divide-transform per f64 defect check; `iterations`
        # counts direct solves (typically 2-3 to meet the contract).
        # The transforms here are global; the sharded backend plugs the
        # pencil-decomposed variant (fft.make_sharded_inner) into the
        # refinement outer directly (parallel/sharded.py).
        if hooks:
            raise ValueError(
                "fft via solve_pressure is single-chip; the sharded backend "
                "uses ops.fft.make_sharded_inner (parallel/sharded.py)")
        if not jax.config.jax_enable_x64 and \
                params.outer_precision != "compensated":
            raise ValueError("fft requires x64 for the f64 master (or "
                             "outer_precision='compensated')")
        # K = solves chained per f64 outer pass (fft_solves_per_outer):
        # the inner re-evaluates the defect in f32 between solves, and the
        # outer's iteration counter then counts DIRECT SOLVES exactly.
        return _solve_pressure_refined(
            p, rhs,
            params.replace(
                sor_refine_every=max(1, params.fft_solves_per_outer)),
            method="rb_sor", inner="fft",
        )
    if method == "pallas_sor":
        # Pallas VMEM kernel as the refinement inner stage.  Single-chip
        # only: the kernel performs K sweeps without halo exchange, so the
        # sharded path keeps the jnp inner (its ghost_fn must run between
        # half-sweeps).
        if hooks:
            raise ValueError("pallas_sor is single-chip only (got shard hooks)")
        if params.disable_pallas:
            raise ValueError("pallas_sor unavailable: params.disable_pallas "
                             "is set (GSPMD backend) — use rb_sor/mg/cg/fft")
        if not jax.config.jax_enable_x64 and \
                params.outer_precision != "compensated":
            raise ValueError("pallas_sor requires x64 for the f64 master "
                             "(or outer_precision='compensated')")
        return _solve_pressure_refined(
            p, rhs, params.replace(sor_refine_every=max(1, params.sor_refine_every)),
            method="rb_sor", inner="pallas")
    if p.dtype == jnp.float32 and params.sor_refine_every > 0:
        if jax.config.jax_enable_x64 or \
                params.outer_precision == "compensated":
            return _solve_pressure_refined(p, rhs, params, method=method,
                                           mean_fn=mean_fn, **hooks)
        import warnings

        warnings.warn(
            "float32 SOR without x64: the mixed-precision refinement is "
            "disabled and the residual cannot reach the reference stopping "
            "threshold on grids >= ~64^2 (docs/numerics.md). Enable jax x64 "
            "(the CLI/bench do) or use dtype='float64'.",
            stacklevel=2,
        )
    return _solve_pressure_direct(p, rhs, params, method=method, **hooks)


def _make_iteration(method, rhs_int, omega, dx2_inv, dy2_inv, red_mask,
                    black_mask, ghost_fn=ghost_fill):
    if method == "rb_sor":
        def iteration(p):
            return rb_sor_iteration(
                p, rhs_int, omega, dx2_inv, dy2_inv, red_mask, black_mask,
                ghost_fn=ghost_fn,
            )
    elif method == "jacobi":
        def iteration(p):
            return jacobi_iteration(p, rhs_int, omega, dx2_inv, dy2_inv,
                                    ghost_fn=ghost_fn)
    else:
        raise ValueError(f"unknown pressure solver method {method!r}")
    return iteration


def _default_l2(params):
    def l2_fn(interior_vals):
        return l2_norm(interior_vals, params.i_max, params.j_max)
    return l2_fn


def _solve_pressure_direct(p, rhs, params, *, method, ghost_fn=ghost_fill,
                           l2_fn=None, parity=0, valid_mask=None):
    """Single-precision-domain solve with the residual check every sweep
    (exact serial semantics, integration.c:136-169).

    `valid_mask` (interior-shaped bool, optional) restricts updates, the
    residual, and the norms to TRUE interior cells — used by padded sharded
    blocks whose trailing pad cells must stay inert (parallel/sharded.py)."""
    dtype = p.dtype
    dx2_inv = jnp.asarray(1.0 / (params.dx * params.dx), dtype)
    dy2_inv = jnp.asarray(1.0 / (params.dy * params.dy), dtype)
    omega = jnp.asarray(params.omega, dtype)
    rhs_int = rhs[1:-1, 1:-1]
    l2_fn = l2_fn or _default_l2(params)

    local_shape = (p.shape[0] - 2, p.shape[1] - 2)
    red_mask = _checkerboard(local_shape, 0, parity)
    black_mask = _checkerboard(local_shape, 1, parity)
    if valid_mask is not None:
        red_mask = red_mask & valid_mask
        black_mask = black_mask & valid_mask

    def masked(arr_int):
        return arr_int if valid_mask is None else jnp.where(
            valid_mask, arr_int, jnp.zeros_like(arr_int))

    norm_p0 = l2_fn(masked(p[1:-1, 1:-1]))
    threshold = params.epsilon * (norm_p0 + NORM_OFFSET)

    iteration = _make_iteration(
        method, rhs_int, omega, dx2_inv, dy2_inv, red_mask, black_mask,
        ghost_fn=ghost_fn,
    )

    def cond(carry):
        p, it, res_norm = carry
        return jnp.logical_and(it < params.max_it, res_norm > threshold)

    def body(carry):
        p, it, _ = carry
        p = iteration(p)
        res_norm = l2_fn(masked(residual(p, rhs_int, dx2_inv, dy2_inv)))
        return p, it + 1, res_norm

    init = (p, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
    p, it, res_norm = lax.while_loop(cond, body, init)
    # Final ghost/halo refresh: the last half-sweep leaves the ring one
    # update stale, and the sharded projection reads neighbor halos (the
    # single-chip projection never reads ghosts, so this is free there).
    return SORResult(p=ghost_fn(p), iterations=it, res_norm=res_norm,
                     converged=res_norm <= threshold)


def _make_inner_sweeps(p_shape, params, *, method, inner, inner_fn, omega32,
                       dx2_inv32, dy2_inv32, red_mask, black_mask, ghost_fn):
    """Build the f32 inner stage `inner_sweeps(neg_res32, n) -> delta` shared
    by the f64 and compensated refinement outers."""
    f32 = jnp.float32

    if inner_fn is not None:
        def inner_sweeps(neg_res32, n_sweeps):
            rhs_full = jnp.zeros(p_shape, f32).at[1:-1, 1:-1].set(neg_res32)
            return inner_fn(rhs_full, n_sweeps)
    elif inner == "pallas":
        from .pallas import sor_kernel

        def inner_sweeps(neg_res32, n_sweeps):
            rhs_full = jnp.zeros(p_shape, f32).at[1:-1, 1:-1].set(neg_res32)
            return sor_kernel.inner_sweeps(rhs_full, n_sweeps, params)
    elif inner == "mg":
        from . import mg

        def inner_sweeps(neg_res32, n_sweeps):
            rhs_full = jnp.zeros(p_shape, f32).at[1:-1, 1:-1].set(neg_res32)
            return mg.inner_v_cycle(rhs_full, n_sweeps, params)
    elif inner == "fft":
        from . import fft as fftmod

        def inner_sweeps(neg_res32, n_sweeps):
            rhs_full = jnp.zeros(p_shape, f32).at[1:-1, 1:-1].set(neg_res32)
            return fftmod.inner_direct(rhs_full, n_sweeps, params)
    elif inner == "cg":
        from . import mg as _mg  # reuse the level-0 Laplacian machinery

        lvl = _mg.build_levels(params)[0]

        def inner_sweeps(neg_res32, n_sweeps):
            """n_sweeps CG iterations on B x = -b, B = -A (SPD), x0 = 0."""
            b = jnp.zeros(p_shape, f32).at[1:-1, 1:-1].set(neg_res32)

            def B(x):
                return -_mg._lap(_mg.ghost_zero(x), lvl)

            def dot(a, c):
                return jnp.sum(a[1:-1, 1:-1] * c[1:-1, 1:-1])

            x0 = jnp.zeros(p_shape, f32)
            r0 = -b
            rs0 = dot(r0, r0)

            def body(_, carry):
                x, r, d, rs = carry
                Bd = B(d)
                denom = dot(d, Bd)
                alpha = jnp.where(denom > 0, rs / denom, 0.0)
                x = x + alpha * d
                r = r - alpha * Bd
                rs_new = dot(r, r)
                beta = jnp.where(rs > 0, rs_new / rs, 0.0)
                d = r + beta * d
                return x, r, d, rs_new

            x, _, _, _ = lax.fori_loop(
                0, jnp.asarray(n_sweeps, jnp.int32), body, (x0, r0, r0, rs0)
            )
            return x
    else:
        def inner_sweeps(neg_res32, n_sweeps):
            """n_sweeps f32 red-black sweeps on A delta = -r, delta0 = 0."""
            delta0 = jnp.zeros(p_shape, f32)
            iteration = _make_iteration(
                method, neg_res32, omega32, dx2_inv32, dy2_inv32, red_mask,
                black_mask, ghost_fn=ghost_fn,
            )
            return lax.fori_loop(0, n_sweeps, lambda _, d: iteration(d), delta0)

    return inner_sweeps


def _refined_setup(p, params, parity, valid_mask, l2_fn):
    """Masks, valid-cell zeroing, and l2 shared by both refinement outers."""
    local_shape = (p.shape[0] - 2, p.shape[1] - 2)
    red_mask = _checkerboard(local_shape, 0, parity)
    black_mask = _checkerboard(local_shape, 1, parity)
    if valid_mask is not None:
        red_mask = red_mask & valid_mask
        black_mask = black_mask & valid_mask

    def masked(arr_int):
        return arr_int if valid_mask is None else jnp.where(
            valid_mask, arr_int, jnp.zeros_like(arr_int))

    return red_mask, black_mask, masked, l2_fn or _default_l2(params)


def _solve_pressure_refined(p, rhs, params, *, method, ghost_fn=ghost_fill,
                            l2_fn=None, parity=0, inner="jnp", inner_fn=None,
                            valid_mask=None, mean_fn=jnp.mean,
                            residual_fn=None):
    """Mixed-precision iterative refinement around f32 SOR sweeps.

    Outer loop (f64, once per K sweeps): defect r = A p - RHS, L2 norm,
    convergence test against the reference threshold, p += delta.
    Inner loop (f32): K red-black SOR sweeps on A delta = -r from delta = 0.
    In exact arithmetic this IS plain SOR (stationary iteration); in floating
    point the f32 sweeps only ever handle the small-scale correction, so the
    ulp(p)-amplification floor never appears.

    `params.outer_precision == "compensated"` swaps the f64 outer for the
    two-float f32 outer (`_solve_pressure_refined_compensated`) — same
    contract, no f64 ops (TPU-emulated), no x64 requirement.
    """
    if params.outer_precision == "compensated":
        if residual_fn is not None:
            raise ValueError(
                "residual_fn (masked sharded defect) is wired for the "
                "float64 outer only — obstacle runs require x64")
        return _solve_pressure_refined_compensated(
            p, rhs, params, method=method, ghost_fn=ghost_fn, l2_fn=l2_fn,
            parity=parity, inner=inner, inner_fn=inner_fn,
            valid_mask=valid_mask, mean_fn=mean_fn)

    K = params.sor_refine_every
    f64, f32 = jnp.float64, jnp.float32

    dx2_inv64 = jnp.asarray(1.0 / (params.dx * params.dx), f64)
    dy2_inv64 = jnp.asarray(1.0 / (params.dy * params.dy), f64)
    dx2_inv32 = dx2_inv64.astype(f32)
    dy2_inv32 = dy2_inv64.astype(f32)
    omega32 = jnp.asarray(params.omega, f32)

    red_mask, black_mask, masked, l2_fn = _refined_setup(
        p, params, parity, valid_mask, l2_fn)

    p64 = p.astype(f64)
    rhs_int64 = rhs[1:-1, 1:-1].astype(f64)

    norm_p0 = l2_fn(masked(p64[1:-1, 1:-1]))
    threshold = params.epsilon * (norm_p0 + NORM_OFFSET)

    inner_sweeps = _make_inner_sweeps(
        p.shape, params, method=method, inner=inner, inner_fn=inner_fn,
        omega32=omega32, dx2_inv32=dx2_inv32, dy2_inv32=dy2_inv32,
        red_mask=red_mask, black_mask=black_mask, ghost_fn=ghost_fn)

    # Outflow problems: the f32-stored rhs carries a constant-mode (Neumann
    # null space) component at its own storage-rounding level that no
    # iterate can remove — on the impulsive first step (rhs ~ 1/dx/dt) that
    # floor EXCEEDS the eps*(||p0||+1.5) threshold (measured: mg burned all
    # 20000 cycles at res=1.8e-4 vs threshold 1.5e-4 on configs/channel.in
    # step 0).  Deflate the CURRENT defect every outer pass: the removal is
    # exact at the outer's precision and the re-rounding error scales with
    # the shrinking defect, not the initial rhs.  Enclosed problems have a
    # compatible rhs by construction and keep the reference bit behavior.
    deflate = params.problem == 3

    def _deflated(r):
        # mean_fn is the sharded hook point: local blocks need the GLOBAL
        # interior mean (psum'd) — a per-block mean would subtract a
        # different constant per shard, changing the problem.  The masked()
        # rewrap keeps padded shards' pad cells inert (-mean would leak in).
        return masked(r - mean_fn(r)) if deflate else r

    def cond(carry):
        _, _, it, res_norm = carry
        return jnp.logical_and(it < params.max_it, res_norm > threshold)

    if residual_fn is None:
        def _defect(q64):
            return residual(ghost_fn(q64), rhs_int64, dx2_inv64, dy2_inv64)
    else:
        # Hook point for non-ghost-strip operators: the sharded masked
        # (obstacle) defect rebuilds per-cell neighbor weights from global
        # indices (parallel/sharded.py) — residual_fn(p64_padded,
        # rhs_int64) -> interior residual, zero on solid cells.
        def _defect(q64):
            return residual_fn(q64, rhs_int64)

    def body(carry):
        p64, r64, it, _ = carry
        n_inner = jnp.minimum(K, params.max_it - it)
        delta = inner_sweeps(-r64.astype(f32), n_inner)
        p64 = p64.at[1:-1, 1:-1].add(delta[1:-1, 1:-1].astype(f64))
        r64 = _deflated(masked(_defect(p64)))
        res_norm = l2_fn(r64)
        return p64, r64, it + n_inner, res_norm

    r64_0 = _deflated(masked(_defect(p64)))
    init = (p64, r64_0, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, f64))
    p64, _, it, res_norm = lax.while_loop(cond, body, init)
    p_out = ghost_fn(p64).astype(p.dtype)
    return SORResult(
        p=p_out,
        iterations=it,
        res_norm=res_norm.astype(p.dtype),
        converged=res_norm <= threshold,
    )


def _solve_pressure_refined_compensated(p, rhs, params, *, method,
                                        ghost_fn=ghost_fill, l2_fn=None,
                                        parity=0, inner="jnp", inner_fn=None,
                                        valid_mask=None, mean_fn=jnp.mean):
    """Two-float (compensated f32) refinement outer — no f64 anywhere.

    TPU f64 is software-emulated, so at large grids the f64 outer pass can
    rival the f32 inner stage it wraps (scripts/step_breakdown.py measures
    the split).  This outer keeps the identical structure and convergence
    contract but carries the master pressure as an error-free f32 pair
    (hi, lo) and evaluates the defect with compensated arithmetic
    (ops/compensated.py) — ~48 mantissa bits at full f32 VPU rate, and no
    global x64 requirement.

    The ghost/halo refresh is applied to hi and lo independently: ghost_fn
    is pure copying/exchange (Neumann strip copy, ppermute halos), which
    commutes with the hi+lo decomposition, so the sharded hooks work
    unchanged (two exchanges per outer pass instead of one).

    Caveat: the convergence L2 norm accumulates in f32 (XLA's pairwise tree,
    ~eps·sqrt(log n) relative) while the f64 outer sums in f64 — when the
    residual lands within that sliver of the threshold, the two outers can
    differ by one K-quantum of sweeps.  Same rounding class as the sharded
    psum'd norms (tests tolerate it there); the defect VALUES themselves are
    ~48-bit (ops/compensated.py).
    """
    from . import compensated as comp

    K = params.sor_refine_every
    f32 = jnp.float32

    dx2_inv32 = jnp.asarray(1.0 / (params.dx * params.dx), f32)
    dy2_inv32 = jnp.asarray(1.0 / (params.dy * params.dy), f32)
    omega32 = jnp.asarray(params.omega, f32)

    red_mask, black_mask, masked, l2_fn = _refined_setup(
        p, params, parity, valid_mask, l2_fn)

    # Two-float split of the inputs: for float64 states the low f32 words of
    # p and rhs are significant — dropping them would make `converged`
    # certify against a ROUNDED problem (f32-native inputs split losslessly
    # to lo = None, skipping the extra arithmetic).
    wide_in = jnp.dtype(p.dtype).itemsize > 4
    p_hi = p.astype(f32)
    rhs_int = rhs[1:-1, 1:-1]
    rhs_int32 = rhs_int.astype(f32)
    if wide_in:
        p_lo = (p - p_hi.astype(p.dtype)).astype(f32)
        rhs_lo32 = (rhs_int - rhs_int32.astype(rhs.dtype)).astype(f32)
    else:
        p_lo = jnp.zeros_like(p_hi)
        rhs_lo32 = None

    norm_p0 = l2_fn(masked(p_hi[1:-1, 1:-1]))
    threshold = jnp.asarray(params.epsilon, f32) * (norm_p0 + NORM_OFFSET)

    inner_sweeps = _make_inner_sweeps(
        p.shape, params, method=method, inner=inner, inner_fn=inner_fn,
        omega32=omega32, dx2_inv32=dx2_inv32, dy2_inv32=dy2_inv32,
        red_mask=red_mask, black_mask=black_mask, ghost_fn=ghost_fn)

    def defect(hi, lo):
        r32 = masked(comp.residual_df(ghost_fn(hi), ghost_fn(lo), rhs_int32,
                                      dx2_inv32, dy2_inv32,
                                      rhs_lo=rhs_lo32))
        if params.problem == 3:
            # Constant-mode deflation for outflow problems — see the f64
            # outer above; here the re-rounding error is relative to the
            # shrinking f32 defect, so the floor shrinks with convergence.
            # mean_fn = the sharded global-mean hook (psum'd); masked()
            # keeps padded shards' pad cells inert.
            r32 = masked(r32 - mean_fn(r32))
        return r32

    def cond(carry):
        _, _, _, it, res_norm = carry
        return jnp.logical_and(it < params.max_it, res_norm > threshold)

    def body(carry):
        hi, lo, r32, it, _ = carry
        n_inner = jnp.minimum(K, params.max_it - it)
        delta = inner_sweeps(-r32, n_inner)
        h2, l2 = comp.df_add_f32(hi[1:-1, 1:-1], lo[1:-1, 1:-1],
                                 delta[1:-1, 1:-1])
        hi = hi.at[1:-1, 1:-1].set(h2)
        lo = lo.at[1:-1, 1:-1].set(l2)
        r32 = defect(hi, lo)
        res_norm = l2_fn(r32)
        return hi, lo, r32, it + n_inner, res_norm

    r32_0 = defect(p_hi, p_lo)
    init = (p_hi, p_lo, r32_0, jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, f32))
    p_hi, p_lo, _, it, res_norm = lax.while_loop(cond, body, init)
    # (hi, lo) stays normalized (|lo| <= ulp(hi)/2), so hi alone IS the
    # correctly-rounded f32 master; for a wider state dtype hand back the
    # full ~48-bit value the pair carries.
    if jnp.dtype(p.dtype).itemsize > 4:
        p_out = ghost_fn(p_hi.astype(p.dtype) + p_lo.astype(p.dtype))
    else:
        p_out = ghost_fn(p_hi).astype(p.dtype)
    return SORResult(
        p=p_out,
        iterations=it,
        res_norm=res_norm.astype(p.dtype),
        converged=res_norm <= threshold,
    )
