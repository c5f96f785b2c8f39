"""Plane Poiseuille channel (problem 3) — beyond-reference model family.

The reference ships only the enclosed-cavity problems (main.c:95-108:
1 = lid-driven, 2 = oscillating lid); this model adds the standard
inflow/outflow benchmark on the same staggered scheme (Griebel et al. 1998,
sect. 5.2 'flow past an obstacle' without the obstacle): parabolic inflow
on the left, flux-balanced zero-gradient outflow on the right, no-slip
walls (ops/boundary.py::apply_channel_bcs).

Why it is a sharp validation: the analytic steady solution

    u(y) = 4 u_max y (b - y) / b^2,   v = 0,   dp/dx = -8 u_max / (Re b^2)

is EXACT for the discrete scheme.  With v = 0 and u uniform in x, both
donor-cell convective stencils vanish identically, and the second
difference of a quadratic is exact — so the developed profile is a fixed
point of the discrete time step up to the pressure-solve tolerance, and
any drift measures solver error, not discretization error.  The from-rest
transient additionally exercises the outflow mass-balance path.

Tests: tests/test_models.py (discrete fixed point, from-rest development,
oracle 1e-4 contract on the channel step).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..config import Params
from ..grid import State, allocate_state


def plane_channel(Re: float = 10.0, nx: int = 64, ny: int = 32,
                  a: float = 2.0, b: float = 1.0, T: float = 1.0,
                  **overrides) -> Params:
    """Problem 3: unit-peak parabolic inflow through an a x b channel."""
    defaults = dict(problem=3, i_max=nx, j_max=ny, a=a, b=b, T=T, Re=Re,
                    tau=0.5, omega=1.7, epsilon=1e-4, max_it=20000)
    defaults.update(overrides)
    return Params(**defaults)


def analytic_u(params: Params, u_max: float = 1.0) -> np.ndarray:
    """Exact developed profile at the u-node heights y_j = (j - 1/2) dy."""
    y = (np.arange(1, params.j_max + 1) - 0.5) * params.dy
    return 4.0 * u_max * y * (params.b - y) / (params.b * params.b)


def analytic_dpdx(params: Params, u_max: float = 1.0) -> float:
    """Exact developed streamwise pressure gradient -8 u_max / (Re b^2)."""
    return -8.0 * u_max / (params.Re * params.b * params.b)


def developed_state(params: Params, u_max: float = 1.0) -> State:
    """State initialized AT the analytic fixed point (u parabolic
    everywhere incl. ghosts via wall reflection, v = 0, p = 0 — the first
    pressure solve recovers the linear dp/dx field itself)."""
    import jax.numpy as jnp

    state = allocate_state(params)
    prof = analytic_u(params, u_max)
    u = np.zeros(params.shape, np.float64)
    u[:, 1:-1] = prof[None, :]
    # Ghost rows via the no-slip wall reflection the BCs would apply.
    u[:, 0] = -u[:, 1]
    u[:, -1] = -u[:, -2]
    return state._replace(u=jnp.asarray(u, state.u.dtype))


def profile_errors(u_field: np.ndarray, params: Params,
                   u_max: float = 1.0) -> Tuple[float, float]:
    """(max abs error at the outflow-adjacent column, max abs error at the
    mid-channel column) of u against the analytic profile."""
    exact = analytic_u(params, u_max)
    mid = params.i_max // 2
    u_np = np.asarray(u_field)
    err_mid = float(np.max(np.abs(u_np[mid, 1:-1] - exact)))
    err_out = float(np.max(np.abs(u_np[params.i_max - 1, 1:-1] - exact)))
    return err_out, err_mid
