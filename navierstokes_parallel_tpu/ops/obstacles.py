"""Flag-field obstacle domains (Griebel et al. 1998, sect. 5.1).

The reference implements only obstacle-free rectangular domains (its
boundaries.c touches the four outer walls exclusively); this module adds
interior solid cells — the classic NaSt2D capability behind the
backward-facing step and flow-past-an-obstacle benchmarks — in a TPU-first
formulation:

  * Geometry is STATIC per `Params.obstacles` (a hashable tuple of cell
    rectangles), so every mask below folds into the jit program as a
    constant — no gather/scatter machinery, no dynamic shapes.
  * Velocity BCs on obstacle faces are fused `jnp.where` passes over
    precomputed masks (zero the wall-normal edges, reflect the tangential
    ghosts), the vector analogue of the outer-wall ghost updates in
    ops/boundary.py.
  * The pressure operator drops solid neighbors per cell via neighbor
    weights + a per-cell self-coefficient (ops/masked.py) — the same
    Neumann folding the outer walls already use in the Pallas kernels
    (sor_kernel.py self-coefficient) and mg masks, generalized to any
    geometry.  This is symmetric and exactly singular on the fluid
    component, unlike the serial NaSt2D trick of averaging neighbor
    pressures into boundary obstacle cells.

Geometry rules (validated in `masks`): obstacles must be at least 2 cells
thick in any direction that has fluid on both sides (Griebel's B_NS/B_EW
exclusion — a 1-cell wall would need two conflicting tangential ghost
values in one cell), and the fluid region must stay connected (the Neumann
pressure system is singular PER connected component; the solvers deflate /
pin exactly one).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params


class ObstacleMasks(NamedTuple):
    """Static numpy masks, all padded-shaped (i_max+2, j_max+2) bool."""

    fluid: np.ndarray      # True on fluid interior cells (ghost ring False)
    # u-edge masks: edge (i, j) sits between cells (i, j) and (i+1, j)
    u_solid: np.ndarray    # edge touches a solid cell -> BC-controlled
    u_refl_n: np.ndarray   # solid-interior edge with fluid row above
    u_refl_s: np.ndarray   # solid-interior edge with fluid row below
    # v-edge masks: edge (i, j) sits between cells (i, j) and (i, j+1)
    v_solid: np.ndarray
    v_refl_e: np.ndarray
    v_refl_w: np.ndarray


def fluid_mask(params: Params) -> np.ndarray:
    """Padded bool mask, True on fluid interior cells."""
    m = np.zeros((params.i_max + 2, params.j_max + 2), bool)
    m[1:-1, 1:-1] = True
    for (i0, i1, j0, j1) in params.obstacles:
        m[i0 : i1 + 1, j0 : j1 + 1] = False
    return m


def _check_geometry(fluid: np.ndarray, params: Params) -> None:
    interior = fluid[1:-1, 1:-1]
    solid = ~interior
    if not solid.any():
        return
    # Thin-wall rule: no solid cell with fluid on both opposite sides.
    fl = fluid
    s = ~fl[1:-1, 1:-1]
    ew = s & fl[2:, 1:-1] & fl[:-2, 1:-1]
    ns = s & fl[1:-1, 2:] & fl[1:-1, :-2]
    if ew.any() or ns.any():
        i, j = np.argwhere(ew | ns)[0] + 1
        raise ValueError(
            f"obstacle wall at cell ({i}, {j}) is 1 cell thin with fluid on "
            f"both sides — obstacles must be >= 2 cells thick (Griebel "
            f"sect. 5.1 geometry rule)")
    # Isolated fluid cells (no fluid neighbor at all) can never be solved.
    nfl = (fl[2:, 1:-1].astype(int) + fl[:-2, 1:-1] + fl[1:-1, 2:]
           + fl[1:-1, :-2])
    if (interior & (nfl == 0)).any():
        i, j = np.argwhere(interior & (nfl == 0))[0] + 1
        raise ValueError(f"fluid cell ({i}, {j}) is fully enclosed by "
                         f"obstacles")
    # Connectivity (the pressure null space is per component).  Vectorized
    # frontier flood fill: O(domain diameter) sweeps; skip on huge grids
    # where the trace-time cost would bite (obstacle workloads are small).
    if params.i_max * params.j_max <= 1 << 18:
        reach = np.zeros_like(interior)
        seed = np.argwhere(interior)[0]
        reach[seed[0], seed[1]] = True
        while True:
            grown = reach.copy()
            grown[1:, :] |= reach[:-1, :]
            grown[:-1, :] |= reach[1:, :]
            grown[:, 1:] |= reach[:, :-1]
            grown[:, :-1] |= reach[:, 1:]
            grown &= interior
            if (grown == reach).all():
                break
            reach = grown
        if not (reach == interior).all():
            raise ValueError(
                "fluid region is disconnected by the obstacles — the "
                "pressure system would be singular per component")


@functools.lru_cache(maxsize=32)
def masks(params: Params) -> ObstacleMasks:
    """Build (and validate) every static mask for `params.obstacles`."""
    fl = fluid_mask(params)
    _check_geometry(fl, params)
    shape = fl.shape
    z = np.zeros(shape, bool)

    # u edge (i, j) between cells (i, j) and (i+1, j); physical edges are
    # i = 0..i_max — domain-wall edges (i = 0, i_max) stay with the outer
    # BCs, obstacle masks cover i = 1..i_max-1 (and solid-interior edges).
    u_solid = z.copy()
    u_solid[1:-2, 1:-1] = ~(fl[1:-2, 1:-1] & fl[2:-1, 1:-1])
    both_solid_u = z.copy()
    both_solid_u[1:-2, 1:-1] = ~fl[1:-2, 1:-1] & ~fl[2:-1, 1:-1]
    fluid_above = z.copy()
    fluid_above[1:-2, 1:-2] = fl[1:-2, 2:-1] & fl[2:-1, 2:-1]
    fluid_below = z.copy()
    fluid_below[1:-2, 2:-1] = fl[1:-2, 1:-2] & fl[2:-1, 1:-2]
    u_refl_n = both_solid_u & fluid_above
    u_refl_s = both_solid_u & fluid_below & ~u_refl_n

    # v edge (i, j) between cells (i, j) and (i, j+1).
    v_solid = z.copy()
    v_solid[1:-1, 1:-2] = ~(fl[1:-1, 1:-2] & fl[1:-1, 2:-1])
    both_solid_v = z.copy()
    both_solid_v[1:-1, 1:-2] = ~fl[1:-1, 1:-2] & ~fl[1:-1, 2:-1]
    fluid_east = z.copy()
    fluid_east[1:-2, 1:-2] = fl[2:-1, 1:-2] & fl[2:-1, 2:-1]
    fluid_west = z.copy()
    fluid_west[2:-1, 1:-2] = fl[1:-2, 1:-2] & fl[1:-2, 2:-1]
    v_refl_e = both_solid_v & fluid_east
    v_refl_w = both_solid_v & fluid_west & ~v_refl_e

    return ObstacleMasks(fluid=fl, u_solid=u_solid, u_refl_n=u_refl_n,
                         u_refl_s=u_refl_s, v_solid=v_solid,
                         v_refl_e=v_refl_e, v_refl_w=v_refl_w)


def apply_obstacle_bcs(u: jax.Array, v: jax.Array, params: Params):
    """No-slip on every obstacle face: zero the BC-controlled edges, then
    write tangential reflections into solid-interior edges adjacent to a
    fluid face (u ghost below/above a horizontal face, v left/right of a
    vertical face) — the flag-field analogue of boundary.set_noslip."""
    m = masks(params)
    u_n = jnp.roll(u, -1, axis=1)   # u[i, j+1]
    u_s = jnp.roll(u, 1, axis=1)
    v_e = jnp.roll(v, -1, axis=0)   # v[i+1, j]
    v_w = jnp.roll(v, 1, axis=0)
    u_bc = jnp.where(m.u_refl_n, -u_n, jnp.where(m.u_refl_s, -u_s, 0.0))
    v_bc = jnp.where(m.v_refl_e, -v_e, jnp.where(m.v_refl_w, -v_w, 0.0))
    u = jnp.where(m.u_solid, u_bc.astype(u.dtype), u)
    v = jnp.where(m.v_solid, v_bc.astype(v.dtype), v)
    return u, v


def pin_fg(F: jax.Array, G: jax.Array, u: jax.Array, v: jax.Array,
           params: Params):
    """F = u / G = v on every BC-controlled edge (Griebel eq. 3.42 applied
    to obstacle faces, exactly as momentum.compute_fg pins the outer
    walls)."""
    m = masks(params)
    return jnp.where(m.u_solid, u, F), jnp.where(m.v_solid, v, G)


def mask_rhs(rhs: jax.Array, params: Params) -> jax.Array:
    """Zero the Poisson RHS on solid cells (they carry no equation)."""
    m = masks(params)
    return jnp.where(m.fluid, rhs, jnp.zeros_like(rhs))


def inflow_profile(params: Params) -> np.ndarray:
    """Channel inflow u(y) at column i = 1, obstacle-aware: a unit-peak
    parabola over EACH contiguous fluid span of the inflow column (reduces
    to the plain Poiseuille profile without obstacles; gives the
    backward-facing step its upper-half inflow for free)."""
    fl = fluid_mask(params)[1, 1:-1] if params.obstacles else \
        np.ones(params.j_max, bool)
    prof = np.zeros(params.j_max)
    j = 0
    while j < params.j_max:
        if not fl[j]:
            j += 1
            continue
        k = j
        while k < params.j_max and fl[k]:
            k += 1
        span = (k - j) * params.dy          # fluid span height
        y = (np.arange(j, k) - j + 0.5) * params.dy
        prof[j:k] = 4.0 * y * (span - y) / (span * span)
        j = k
    return prof
