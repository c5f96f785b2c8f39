"""Free-surface flows on the manual shard_map backend — the last model
family that was GSPMD-only (round-4 verdict stretch item 10).

Design: **replicated master, partitioned sweeps.**  The free-surface
geometry is TRACED data rebuilt every step from the marker particles
(ops/surface.py::cell_flags), so the static-mask machinery of the
obstacle deep-halo path does not apply.  Instead of re-deriving a
block-scattered layout for a per-step-changing operator, this twin keeps
every carried array REPLICATED (particles already are, per the GSPMD
design) and shard_maps only the O(K * N) hot stage — the f32
correction sweeps inside ops/surface.py::solve_pressure_free:

  * each shard slices an (li + 2H, lj + 2H) window around its own block
    from the (H-zero-padded) replicated delta / rhs / weight arrays —
    replication plays the role of the halo exchange, so there is no
    ppermute at all;
  * it runs C = Params.sor_comm_every exact masked red-black sweeps on
    the window (the per-cell arithmetic of ops/masked.py::
    masked_rb_iteration); with H = 2C the window ring is deep enough
    that roll wrap-around pollution never reaches the (li, lj) core —
    the same containment argument as parallel/deep_halo.py;
  * the cores are psum-assembled back into the replicated delta (the
    only collective, once per C sweeps).

Numerics are therefore EXACTLY the single-chip solve's (same sweep
order, same masks, fp-identical modulo reduction order), which the tests
assert at 1e-10 on the CPU mesh; the f64 master / SUMMAC refresh /
defect logic is ops/surface.py's, shared verbatim through the
`inner_fn` hook.  The trade vs the obstacle deep-halo path is explicit:
one full-grid f32 psum per C sweeps instead of halo strips — the price
of a traced, per-step-changing operator.  Everything outside the sweeps
(momentum, BCs, particle advection, flag rebuild) is replicated compute.

Reference analogue: none (the reference has neither free surfaces nor
any multi-device capability).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Params
from ..ops import masked
from .sharded import shard_map
from .topology import MESH_AXES, local_block_dims

f32 = jnp.float32


@functools.lru_cache(maxsize=32)
def make_free_inner(params: Params, mesh: Mesh):
    """Build the `inner_fn` hook for ops/surface.py::solve_pressure_free:
    partitioned correction sweeps over `mesh` (see module docstring)."""
    px, py = mesh.devices.shape
    li, lj = local_block_dims((px, py), params.i_max, params.j_max)
    C = max(1, params.sor_comm_every)
    H = 2 * C
    i_max, j_max = params.i_max, params.j_max
    omega = jnp.asarray(params.omega, f32)

    # Pad-to-divisible extents (zero when the mesh divides the grid).
    ex = px * li - i_max
    ey = py * lj - j_max

    def shard_body(neg_r32, w_e, w_w, w_n, w_s, diag, red, black, n_inner):
        ox = lax.axis_index("x") * li
        oy = lax.axis_index("y") * lj

        def win(a):
            # Interior-shaped global array -> this shard's H-ringed window.
            # Zero-pad to the mesh-divisible extent FIRST: lax.dynamic_slice
            # CLAMPS an out-of-bounds start, which would silently shift the
            # last shard's core rows on non-divisible grids.  Pad cells have
            # zero weights and False red/black masks, so they are inert.
            return lax.dynamic_slice(
                jnp.pad(a, ((H, H + ex), (H, H + ey))), (ox, oy),
                (li + 2 * H, lj + 2 * H))

        rhs_w = win(neg_r32)
        we_w, ww_w = win(w_e), win(w_w)
        wn_w, ws_w = win(w_n), win(w_s)
        # Pad cells get diag 1 (never updated: masks are False there).
        dg_w = win(jnp.asarray(diag, f32) - 1.0) + 1.0
        red_w = win(red)
        black_w = win(black)

        def half(d, mask):
            nb = (jnp.roll(d, -1, 0) * we_w + jnp.roll(d, 1, 0) * ww_w
                  + jnp.roll(d, -1, 1) * wn_w + jnp.roll(d, 1, 1) * ws_w)
            return jnp.where(mask,
                             (1.0 - omega) * d + (omega / dg_w)
                             * (nb - rhs_w), d)

        def round_body(carry):
            delta, remaining = carry
            ns = jnp.minimum(remaining, C)
            d = win(delta)

            def sweep(k, d):
                # Guarded sweep: rounds are C long except possibly the
                # last (n_inner need not divide C).
                return lax.cond(k < ns,
                                lambda d: half(half(d, red_w), black_w),
                                lambda d: d, d)

            d = lax.fori_loop(0, C, sweep, d)
            core = d[H:-H, H:-H]
            own = lax.dynamic_update_slice(
                jnp.zeros((px * li, py * lj), f32), core, (ox, oy))
            assembled = lax.psum(own, MESH_AXES)[:i_max, :j_max]
            return assembled, remaining - ns

        delta0 = jnp.zeros((i_max, j_max), f32)
        delta, _ = lax.while_loop(lambda c: c[1] > 0, round_body,
                                  (delta0, n_inner.astype(jnp.int32)))
        return delta

    mapped = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(),) * 9,
        out_specs=P(),
        check_vma=False,
    )

    def inner_fn(neg_r32, n_inner, w: masked._Weights, red, black):
        delta_int = mapped(
            neg_r32.astype(f32),
            jnp.asarray(w.w_e, f32), jnp.asarray(w.w_w, f32),
            jnp.asarray(w.w_n, f32), jnp.asarray(w.w_s, f32),
            jnp.asarray(w.diag, f32), red, black,
            jnp.asarray(n_inner, jnp.int32))
        # Padded-shape delta with the single-chip zero ghost ring.
        return jnp.zeros(params.shape, f32).at[1:-1, 1:-1].set(delta_int)

    return inner_fn


@functools.lru_cache(maxsize=32)
def make_free_step_sharded(params: Params, mesh: Mesh,
                           wall: str = "noslip",
                           ppc: Optional[int] = None,
                           p_surface: str = "interpolated"):
    """Jitted free-surface step whose pressure correction sweeps run
    shard_mapped over `mesh`; every carried array stays replicated (no
    placement/gather calls needed — FreeSurfaceState in, FreeSurfaceState
    out, same contract as models/freesurface.py::make_free_step_fn)."""
    from ..models import freesurface as FS

    inner = make_free_inner(params, mesh)

    @jax.jit
    def _step(fs):
        return FS.free_step(fs, params, wall=wall, ppc=ppc,
                            p_surface=p_surface, pressure_inner_fn=inner)

    return _step


def solve_free_sharded(params: Params, fs, mesh: Mesh, *,
                       wall: str = "noslip", ppc: Optional[int] = None,
                       p_surface: str = "interpolated"):
    """Whole `while t < T` free-surface integration with sharded sweeps —
    the shard_map twin of models/freesurface.py::solve_free(mesh=...).
    Returns (FreeSurfaceState, SolveStats)."""
    from ..models import freesurface as FS

    inner = make_free_inner(params, mesh)
    if ppc is None:
        ppc = params.particles_per_cell
    return FS._solve_free(params, fs, wall, ppc, p_surface, inner)
