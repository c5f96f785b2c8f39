"""Halo exchange over the device mesh (used inside `shard_map`).

Each shard holds a (li+2, lj+2) padded block: li x lj interior plus a
one-cell halo ring.  Interior shard boundaries are refreshed with
`lax.ppermute` strip exchanges riding the ICI; physical-domain halos are
closed by per-field boundary-condition closures (see sharded.py).  This is
the multi-chip analogue of the reference CUDA kernel's shared-memory halo
loads (src/parallel/main.cu:411-484) — except the "tile" is a whole chip's
shard and the "shared memory" is its HBM/VMEM.

Exchange order is y (axis 1) first, then x (axis 0) sending full columns
*including* the freshly filled y-halo entries, so corner halo cells pick up
the diagonal neighbor's value — required by the donor-cell stencils' mixed
offsets (e.g. v[i+1][j-1] in duv_dy, integration.c:17-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _shift_up(strip, axis_name):
    """Send each shard's strip to the next-higher index along axis_name;
    the lowest shard receives zeros."""
    n = lax.axis_size(axis_name)
    return lax.ppermute(strip, axis_name, [(k, k + 1) for k in range(n - 1)])


def _shift_down(strip, axis_name):
    n = lax.axis_size(axis_name)
    return lax.ppermute(strip, axis_name, [(k + 1, k) for k in range(n - 1)])


def exchange_halo(local: jax.Array, x_axis: str = "x", y_axis: str = "y") -> jax.Array:
    """Refresh all four halo strips of a padded local block from mesh
    neighbors.  Halos at physical domain edges receive zeros — callers MUST
    overwrite them with the field's boundary-condition closure."""
    # --- y direction (axis 1): exchange full rows (length li+2) -----------
    from_below = _shift_up(local[:, -2], y_axis)   # neighbor below's top row
    from_above = _shift_down(local[:, 1], y_axis)  # neighbor above's bottom row
    local = local.at[:, 0].set(from_below)
    local = local.at[:, -1].set(from_above)
    # --- x direction (axis 0): exchange full columns (length lj+2),
    # including the y-halo entries just written -> corners become diagonal
    # neighbor values.
    from_left = _shift_up(local[-2, :], x_axis)
    from_right = _shift_down(local[1, :], x_axis)
    local = local.at[0, :].set(from_left)
    local = local.at[-1, :].set(from_right)
    return local


def edge_masks(x_axis: str = "x", y_axis: str = "y"):
    """Booleans identifying this shard's position on the physical boundary."""
    xi = lax.axis_index(x_axis)
    yi = lax.axis_index(y_axis)
    return {
        "left": xi == 0,
        "right": xi == lax.axis_size(x_axis) - 1,
        "bottom": yi == 0,
        "top": yi == lax.axis_size(y_axis) - 1,
    }


def _where_set_col(arr, j, cond, values):
    return arr.at[:, j].set(jnp.where(cond, values, arr[:, j]))


def _where_set_row(arr, i, cond, values):
    return arr.at[i, :].set(jnp.where(cond, values, arr[i, :]))


def close_pressure_halo(p: jax.Array, edges) -> jax.Array:
    """Homogeneous Neumann closure at physical edges (integration.c:138-146):
    the ghost cell copies its interior neighbor."""
    p = _where_set_row(p, 0, edges["left"], p[1, :])
    p = _where_set_row(p, -1, edges["right"], p[-2, :])
    p = _where_set_col(p, 0, edges["bottom"], p[:, 1])
    p = _where_set_col(p, -1, edges["top"], p[:, -2])
    return p


def neumann_or_exchange(p: jax.Array) -> jax.Array:
    """The sharded ghost_fn for the SOR solver: ppermute interior halos,
    Neumann-close physical ones."""
    edges = edge_masks()
    return close_pressure_halo(exchange_halo(p), edges)
