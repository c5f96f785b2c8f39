"""Natural convection (Boussinesq) — differentially heated square cavity.

Beyond-reference model family: the reference solves only isothermal
cavities; this couples the energy equation of Griebel et al. 1998 ch. 9
(ops/energy.py) to the same staggered momentum/pressure core and
validates against the de Vahl Davis (1983) benchmark — THE standard
natural-convection test.

Scaling: velocity scale U = sqrt(g beta dT L) (the "convective" scale),
so the dimensionless system is exactly the isothermal one plus

    momentum:  ... + T j_hat        (buoyancy coefficient 1)
    energy:    T_t + (uT)_x + (vT)_y = lap(T) / sqrt(Ra Pr)

with Re = sqrt(Ra/Pr) and alpha = 1/(Re Pr) = 1/sqrt(Ra Pr).  Hot wall
T=+1/2 on the left, cold T=-1/2 on the right, adiabatic top/bottom,
no-slip everywhere.  The mean hot-wall Nusselt number must land on de
Vahl Davis's values (1.118 / 2.243 / 4.519 / 8.8 for Ra=1e3..1e6).

Steady state is detected on device (max |dT| per step under a
threshold); the integration runs as jitted chunks so the host sees one
scalar per chunk.  Everything is pure jnp — the family is
differentiable end to end with diff.py's pressure wrapper if needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Params
from ..grid import allocate_state
from ..ops import boundary, energy, momentum, sor
from ..ops import stencils as st


class ThermalConfig(NamedTuple):
    """Dimensionless thermal coupling constants (see module docstring)."""
    alpha: float          # thermal diffusivity = 1/(Re*Pr)
    beta_gx: float        # buoyancy coefficient on F (usually 0)
    beta_gy: float        # buoyancy coefficient on G (-1: hot rises)
    t_left: float = 0.5   # hot wall
    t_right: float = -0.5  # cold wall
    # Temperature of interior obstacle cells (params.obstacles):
    # None = adiabatic blocks, a float = isothermal blocks at that value
    # (ops/energy.py::apply_obstacle_temperature_bcs).  Ignored without
    # obstacles.
    t_obstacle: Optional[float] = None


class ThermalState(NamedTuple):
    u: jax.Array
    v: jax.Array
    p: jax.Array
    T: jax.Array
    t: jax.Array
    n: jax.Array


def convection_setup(Ra: float, Pr: float = 0.71, n: int = 64,
                     tau: float = 0.5, epsilon: float = 1e-4,
                     dtype: str = "float32",
                     max_it: int = 20000) -> Tuple[Params, ThermalConfig]:
    """Params + ThermalConfig for the de Vahl Davis cavity at Rayleigh
    number Ra (square, unit walls, convective velocity scale)."""
    Re = float(jnp.sqrt(Ra / Pr))
    params = Params(problem=1, i_max=n, j_max=n, a=1.0, b=1.0, T=1e9,
                    Re=Re, tau=tau, omega=1.7, epsilon=epsilon,
                    max_it=max_it, dtype=dtype)
    cfg = ThermalConfig(alpha=1.0 / (Re * Pr), beta_gx=0.0, beta_gy=-1.0)
    return params, cfg


def heated_block_setup(Ra: float, Pr: float = 0.71, n: int = 64,
                       block_frac: float = 0.4, t_walls: float = -0.5,
                       t_block: float = 0.5, tau: float = 0.5,
                       epsilon: float = 1e-4, dtype: str = "float32",
                       max_it: int = 20000
                       ) -> Tuple[Params, ThermalConfig]:
    """Isothermal hot square block centered in a cavity with cooled side
    walls and adiabatic top/bottom (the House/Ha 'enclosure with a heated
    inner body' configuration) — the obstacle-composed member of the
    Boussinesq family: flag-field no-slip on the block, Dirichlet block
    temperature via the solid-ghost reflection
    (ops/energy.py::apply_obstacle_temperature_bcs), masked pressure
    solve.  Validated by exact domain equivalence (a full-height
    isothermal strip flush against a wall reproduces the narrower plain
    cavity) and by the steady-state heat balance block flux == wall flux
    (tests/test_convection.py)."""
    Re = float(jnp.sqrt(Ra / Pr))
    half = max(1, int(round(0.5 * block_frac * n)))
    c0 = n // 2 - half + 1
    c1 = n // 2 + half
    params = Params(problem=1, i_max=n, j_max=n, a=1.0, b=1.0, T=1e9,
                    Re=Re, tau=tau, omega=1.7, epsilon=epsilon,
                    max_it=max_it, dtype=dtype,
                    obstacles=((c0, c1, c0, c1),))
    cfg = ThermalConfig(alpha=1.0 / (Re * Pr), beta_gx=0.0, beta_gy=-1.0,
                        t_left=t_walls, t_right=t_walls,
                        t_obstacle=t_block)
    return params, cfg


def block_heat_flux(T, params: Params, t_block: float) -> float:
    """Total heat flux leaving the obstacle block through its boundary
    faces, sum over fluid cells adjacent to solid of the one-sided
    Dirichlet gradient 2 (t_block - T_fluid)/d * face length (the exact
    discrete flux the solid-ghost reflection encodes).  At steady state
    with adiabatic top/bottom this must balance the flux out through the
    cooled side walls: (Nu_left + Nu_right) * b * dT_wall-scale."""
    import numpy as np
    from ..ops.obstacles import fluid_mask

    fl = fluid_mask(params)
    interior = np.zeros_like(fl)
    interior[1:-1, 1:-1] = True
    solid = interior & ~fl
    Tn = np.asarray(T)
    # One face term per (fluid cell, solid-neighbor direction): gradient
    # 2 (t_block - T)/d across the half-cell to the face, times the face
    # length.  Directions summed separately so a 1-wide fluid channel
    # between two blocks counts both its faces.
    flux = 0.0
    for shift_ax, d, face in ((0, params.dx, params.dy),
                              (1, params.dy, params.dx)):
        for sgn in (-1, 1):
            adj = fl & np.roll(solid, sgn, shift_ax)
            flux += np.sum(2.0 * (t_block - Tn[adj])) / d * face
    return float(flux)


def allocate_thermal(params: Params, cfg: ThermalConfig) -> ThermalState:
    """From-rest state with the conduction (linear) temperature profile —
    a much better starting point than isothermal (the linear profile is
    the exact zero-velocity solution, so early steps measure buoyancy,
    not a thermal shock)."""
    base = allocate_state(params)
    x = (jnp.arange(params.i_max + 2) - 0.5) / params.i_max
    T0 = cfg.t_left + (cfg.t_right - cfg.t_left) * x
    T = jnp.broadcast_to(T0[:, None], params.shape).astype(base.p.dtype)
    T = energy.apply_temperature_bcs(T, params, cfg.t_left, cfg.t_right)
    return ThermalState(u=base.u, v=base.v, p=base.p, T=T, t=base.t,
                        n=base.n)


def thermal_step(ts: ThermalState, params: Params, cfg: ThermalConfig,
                 pressure_method: str = "mg"):
    """One Boussinesq time step (Griebel ch. 9 ordering: T first with the
    old velocities, then momentum with the NEW temperature).  Returns
    (new_state, (dt, max_dT, sor_result))."""
    u, v, p, T, t, n = ts

    # CFL dt with the additional explicit-diffusion bound for T.
    dx, dy = params.dx, params.dy
    u_max = st.max_interior(u)
    v_max = st.max_interior(v)
    visc = params.Re / 2.0 / (1.0 / (dx * dx) + 1.0 / (dy * dy))
    dt = params.tau * jnp.minimum(
        jnp.minimum(visc, energy.thermal_dt_limit(params, cfg.alpha)),
        jnp.minimum(dx / jnp.abs(u_max), dy / jnp.abs(v_max)))
    gamma = jnp.maximum(u_max * dt / dx, v_max * dt / dy)

    u, v = boundary.apply_cavity_bcs(u, v, jnp.zeros((), u.dtype))
    if params.obstacles:
        from ..ops import obstacles as obs

        u, v = obs.apply_obstacle_bcs(u, v, params)
    T = energy.apply_temperature_bcs(T, params, cfg.t_left, cfg.t_right)
    T = energy.apply_obstacle_temperature_bcs(T, params, cfg.t_obstacle)
    T_new = energy.advance_temperature(T, u, v, dt, gamma, params,
                                       cfg.alpha)
    T_new = energy.apply_temperature_bcs(T_new, params, cfg.t_left,
                                         cfg.t_right)
    T_new = energy.apply_obstacle_temperature_bcs(T_new, params,
                                                  cfg.t_obstacle)

    F, G = momentum.compute_fg(u, v, dt, gamma, params)
    F, G = energy.buoyant_fg(F, G, T_new, dt, cfg.beta_gx, cfg.beta_gy)
    if params.obstacles:
        F, G = obs.pin_fg(F, G, u, v, params)
    rhs = momentum.compute_rhs(F, G, dt, params)
    if params.obstacles:
        rhs = obs.mask_rhs(rhs, params)
    result = sor.solve_pressure(p, rhs, params, method=pressure_method)
    u, v = momentum.project_velocities(u, v, F, G, result.p, dt, params)
    if params.obstacles:
        # The projection slice sweeps obstacle faces too — restore
        # no-slip so the state stays consistent (solver.step does the
        # same).
        u, v = obs.apply_obstacle_bcs(u, v, params)

    max_dT = jnp.max(jnp.abs(T_new[1:-1, 1:-1] - T[1:-1, 1:-1]))
    new = ThermalState(u=u, v=v, p=result.p, T=T_new, t=t + dt, n=n + 1)
    return new, (dt, max_dT, result)


def solve_convection(params: Params, cfg: ThermalConfig,
                     state: Optional[ThermalState] = None, *,
                     pressure_method: str = "mg",
                     steady_tol: float = 1e-6,
                     max_steps: int = 200_000,
                     chunk: int = 200,
                     mesh=None):
    """Integrate to steady state: stop when max|dT|/dt of a step falls
    under steady_tol (or max_steps).  Jitted chunks; one scalar fetch
    per chunk.  Returns (state, info dict).

    `mesh`: a 2D jax.sharding.Mesh makes the family multi-chip via the
    GSPMD recipe (parallel/gspmd.py): the four grid fields are
    boundary-padded and block-sharded, the UNMODIFIED thermal step is
    jitted under those shardings, and XLA's partitioner inserts the
    collectives — no thermal-specific communication code."""
    if mesh is not None:
        return _solve_convection_gspmd(
            params, cfg, state, pressure_method=pressure_method,
            steady_tol=steady_tol, max_steps=max_steps, chunk=chunk,
            mesh=mesh)
    if state is None:
        state = allocate_thermal(params, cfg)

    @jax.jit
    def run_chunk(ts):
        def body(carry, _):
            ts, _, failed = carry
            new, (dt, max_dT, res) = thermal_step(
                ts, params, cfg, pressure_method=pressure_method)
            return (new, max_dT / dt,
                    failed + (~res.converged).astype(jnp.int32)), None

        init = (ts, jnp.asarray(jnp.inf, ts.T.dtype),
                jnp.zeros((), jnp.int32))
        (ts, rate, failed), _ = lax.scan(body, init, None, length=chunk)
        return ts, rate, failed

    steps = 0
    failures = 0
    rate = float("inf")
    while steps < max_steps:
        state, rate_dev, failed = run_chunk(state)
        rate = float(rate_dev)
        failures += int(failed)
        steps += chunk
        if rate < steady_tol:
            break
    return state, {"steps": steps, "dT_rate": rate,
                   "sor_failures": failures,
                   "steady": rate < steady_tol}


def _solve_convection_gspmd(params: Params, cfg: ThermalConfig, state, *,
                            pressure_method, steady_tol, max_steps, chunk,
                            mesh):
    """GSPMD multi-chip arm of solve_convection (see its docstring)."""
    from ..parallel import gspmd

    gspmd._check_mesh(mesh)
    if pressure_method == "pallas_sor":
        raise ValueError("gspmd convection cannot run pallas_sor "
                         "(opaque to the SPMD partitioner)")
    # Pin the jnp formulations + the matmul DCT route (the partitioner
    # cannot shard Pallas calls; jnp.fft gathers).
    params = params.replace(disable_pallas=True)
    if state is None:
        state = allocate_thermal(params, cfg)

    grid, rep = gspmd._shardings(mesh)
    ni, nj = params.shape
    pi, pj = gspmd._padded_shape(mesh, (ni, nj))

    def pad(a):
        return jax.device_put(
            jnp.zeros((pi, pj), a.dtype).at[:ni, :nj].set(jnp.asarray(a)),
            grid)

    placed = ThermalState(u=pad(state.u), v=pad(state.v), p=pad(state.p),
                          T=pad(state.T),
                          t=jax.device_put(state.t, rep),
                          n=jax.device_put(state.n, rep))

    out_shardings = (ThermalState(u=grid, v=grid, p=grid, T=grid,
                                  t=rep, n=rep), rep, rep)

    @functools.partial(jax.jit, out_shardings=out_shardings)
    def run_chunk(padded):
        ts = ThermalState(u=padded.u[:ni, :nj], v=padded.v[:ni, :nj],
                          p=padded.p[:ni, :nj], T=padded.T[:ni, :nj],
                          t=padded.t, n=padded.n)

        def body(carry, _):
            ts, _, failed = carry
            new, (dt, max_dT, res) = thermal_step(
                ts, params, cfg, pressure_method=pressure_method)
            return (new, max_dT / dt,
                    failed + (~res.converged).astype(jnp.int32)), None

        init = (ts, jnp.asarray(jnp.inf, ts.T.dtype),
                jnp.zeros((), jnp.int32))
        (ts, rate, failed), _ = lax.scan(body, init, None, length=chunk)

        def repad(a):
            return jnp.zeros((pi, pj), a.dtype).at[:ni, :nj].set(a)

        return (ThermalState(u=repad(ts.u), v=repad(ts.v), p=repad(ts.p),
                             T=repad(ts.T), t=ts.t, n=ts.n), rate, failed)

    steps = 0
    failures = 0
    rate = float("inf")
    while steps < max_steps:
        placed, rate_dev, failed = run_chunk(placed)
        rate = float(rate_dev)
        failures += int(failed)
        steps += chunk
        if rate < steady_tol:
            break
    final = ThermalState(u=jnp.asarray(placed.u[:ni, :nj]),
                         v=jnp.asarray(placed.v[:ni, :nj]),
                         p=jnp.asarray(placed.p[:ni, :nj]),
                         T=jnp.asarray(placed.T[:ni, :nj]),
                         t=placed.t, n=placed.n)
    return final, {"steps": steps, "dT_rate": rate,
                   "sor_failures": failures,
                   "steady": rate < steady_tol}


def nusselt_hot_wall(T: jax.Array, params: Params,
                     t_left: float = 0.5) -> float:
    """Mean Nusselt number at the hot (left) wall: -dT/dx integrated over
    the wall (dT=1, L=1 => conduction gives exactly 1).  The Dirichlet
    ghost reflection makes the one-sided wall gradient
    2 (T[1,j] - t_left)/dx."""
    g = -2.0 * (jnp.asarray(T)[1, 1:-1] - t_left) * params.i_max
    return float(jnp.mean(g))


def nusselt_cold_wall(T: jax.Array, params: Params,
                      t_right: float = -0.5) -> float:
    g = -2.0 * (t_right - jnp.asarray(T)[-2, 1:-1]) * params.i_max
    return float(jnp.mean(g))


# de Vahl Davis (1983) benchmark mean hot-wall Nusselt numbers.
DE_VAHL_DAVIS_NU = {1e3: 1.118, 1e4: 2.243, 1e5: 4.519, 1e6: 8.800}
