"""Taylor-Green vortex in a free-slip box (problem 4) — the EXACT
time-dependent Navier-Stokes solution, and therefore the one benchmark
that measures the solver's TOTAL space-time discretization error against
truth rather than against other numerics.  No reference analogue (the
reference ships only the no-slip cavity problems, main.c:95-108).

With the phase chosen so the free-slip (no-stress) box conditions hold
exactly on [0, a] x [0, a] (normal velocity AND tangential shear vanish
on every wall):

    u(x, y, t) =  sin(k x) cos(k y) exp(-2 k^2 t / Re)
    v(x, y, t) = -cos(k x) sin(k y) exp(-2 k^2 t / Re)
    p(x, y, t) = +(cos(2 k x) + cos(2 k y)) / 4 * exp(-4 k^2 t / Re)

(the sign of p is opposite the textbook u = cos sin variant: here
u.grad u_x = (k f^2 / 2) sin 2kx, so grad p must point the other way)

with k = mode * pi / a: the nonlinear term is a pure gradient absorbed by
p, so the field decays in place by pure diffusion.  Kinetic energy decays
as exp(-4 k^2 t / Re).

Validations (tests/test_taylorgreen.py): pointwise error against the
exact solution with asserted 2nd-order grid convergence (the adaptive dt
is diffusion-bound ~ dx^2 here, so the 1st-order time error also scales
as dx^2 — the measured order is clean), kinetic-energy decay-rate match,
the f64 oracle 1e-4 contract on the problem-4 step, and single-chip ==
sharded equivalence (the free-slip BC twin in parallel/sharded.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..grid import State, allocate_state


def taylor_green(n: int = 64, Re: float = 50.0, T: float = 0.3,
                 mode: int = 1, **overrides) -> Tuple[Params, State]:
    """Problem 4: mode-`mode` Taylor-Green vortex in the unit free-slip
    box, sampled on the staggered grid at t = 0."""
    defaults = dict(problem=4, i_max=n, j_max=n, a=1.0, b=1.0, T=T, Re=Re,
                    tau=0.5, omega=1.7, epsilon=1e-6, max_it=20000)
    defaults.update(overrides)
    params = Params(**defaults)
    state = allocate_state(params)
    u, v, _ = exact_fields(params, 0.0, mode=mode)
    return params, state._replace(u=jnp.asarray(u, state.u.dtype),
                                  v=jnp.asarray(v, state.v.dtype))


def exact_fields(params: Params, t: float, mode: int = 1
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact solution sampled at the staggered node positions, padded
    shapes (ghosts included — the BC pass overwrites them).  u node (i, j)
    sits at (i dx, (j - 1/2) dy), v at ((i - 1/2) dx, j dy), p at cell
    centers."""
    k = mode * np.pi / params.a
    nu = 1.0 / params.Re
    decay = np.exp(-2.0 * k * k * nu * t)
    nx, ny = params.shape
    dx, dy = params.dx, params.dy
    xe = np.arange(nx) * dx               # edge positions i dx
    xc = (np.arange(nx) - 0.5) * dx       # center positions
    ye = np.arange(ny) * dy
    yc = (np.arange(ny) - 0.5) * dy
    u = np.sin(k * xe)[:, None] * np.cos(k * yc)[None, :] * decay
    v = -np.cos(k * xc)[:, None] * np.sin(k * ye)[None, :] * decay
    p = 0.25 * (np.cos(2 * k * xc)[:, None]
                + np.cos(2 * k * yc)[None, :]) * decay * decay
    return u, v, p


def errors(state: State, params: Params, mode: int = 1) -> Dict[str, float]:
    """Max-abs interior errors against the exact solution at state.t.
    Pressure is compared mean-removed (the enclosed Neumann problem fixes
    p only up to a constant)."""
    ue, ve, pe = exact_fields(params, float(state.t), mode=mode)
    i, j = params.i_max, params.j_max
    u_err = np.abs(np.asarray(state.u)[1:i, 1:-1] - ue[1:i, 1:-1]).max()
    v_err = np.abs(np.asarray(state.v)[1:-1, 1:j] - ve[1:-1, 1:j]).max()
    p_num = np.asarray(state.p)[1:-1, 1:-1]
    p_exa = pe[1:-1, 1:-1]
    p_err = np.abs((p_num - p_num.mean()) - (p_exa - p_exa.mean())).max()
    return {"u": float(u_err), "v": float(v_err), "p": float(p_err)}


def kinetic_energy(state: State, params: Params) -> float:
    """0.5 * integral(u^2 + v^2) via cell-centered averages."""
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    uc = 0.5 * (u[:-2, 1:-1] + u[1:-1, 1:-1])
    vc = 0.5 * (v[1:-1, :-2] + v[1:-1, 1:-1])
    return float(0.5 * np.sum(uc * uc + vc * vc) * params.dx * params.dy)


def exact_energy(params: Params, t: float, mode: int = 1) -> float:
    """Exact kinetic energy a^2/4 * exp(-4 k^2 t / Re) (unit amplitude)."""
    k = mode * np.pi / params.a
    return float(0.25 * params.a * params.b
                 * np.exp(-4.0 * k * k * t / params.Re))
