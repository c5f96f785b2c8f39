"""Free-surface flows (marker-and-cell): dam break, drops, sloshing.

The model family the serial lineage's ch. 8 supports and the reference
repo dropped: a liquid with a moving free boundary in a no-slip box,
tracked by marker particles (particles.py), with the flag-field surface
machinery of ops/surface.py.  One time step (Griebel alg. 8.1):

  1. adaptive dt (the CFL limit already bounds particle motion to one
     cell per step, the MAC requirement),
  2. no-slip wall BCs,
  3. flag field from the particles (traced — one compiled program covers
     the whole evolving geometry),
  4. free-surface velocity BCs (divergence-zeroing correction on surface
     cells + velocity continuation into the first empty layer),
  5. tentative F/G with gravity, pinned to u/v on non-fluid-fluid faces,
     RHS masked to bulk cells,
  6. pressure solve with p = 0 Dirichlet on surface cells (no null
     space); because every non-bulk cell holds p = 0, the unmasked
     projection is automatically a no-op on non-fluid-fluid faces,
  7. re-impose the surface correction on the projected field,
  8. advect the particles through the end-of-step field (Heun).

Setups: `dam_break` (liquid column collapse — THE free-surface benchmark,
Martin & Moyce 1952), `drop` (free-falling blob), `filled_box` (hydro-
static column).  Validations in tests/test_freesurface.py: exact surface-
cell divergence, hydrostatic equilibrium pressure profile, free-fall
center-of-mass kinematics, dam-break front-speed bounds + volume
conservation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import Params
from ..grid import State, allocate_state
from ..ops import boundary, momentum
from ..ops import surface as surf
from ..ops.boundary import Side
from .. import particles as P
from .. import solver as _solver


class FreeSurfaceState(NamedTuple):
    state: State
    pset: P.ParticleSet


def _box_bcs(u, v, wall: str = "noslip"):
    """Container walls: no-slip (reference semantics) or free-slip (the
    standard dam-break setting — no-slip pins a particle film to the
    walls)."""
    if wall not in ("noslip", "freeslip"):
        raise ValueError(f"unknown wall condition {wall!r}")
    set_wall = (boundary.set_noslip if wall == "noslip"
                else boundary.set_freeslip)
    u, v = set_wall(u, v, Side.LEFT)
    u, v = set_wall(u, v, Side.RIGHT)
    u, v = set_wall(u, v, Side.BOTTOM)
    u, v = set_wall(u, v, Side.TOP)
    return u, v


def free_step(fs: FreeSurfaceState, params: Params, *,
              wall: str = "noslip",
              ) -> Tuple[FreeSurfaceState, _solver.StepDiagnostics]:
    """One free-surface time step.  Pure; jit over `fs` (the flag field is
    traced data, so geometry changes never retrace)."""
    u, v, p, t, n = fs.state
    dt, gamma = momentum.adaptive_dt_gamma(u, v, params)
    # Gravity CFL: the reference formula bounds dt by the CURRENT velocity
    # maxima, which is vacuous from rest — with a body force the velocity
    # gained within the step must also move particles less than one cell
    # (the MAC requirement: a particle may never skip a cell, Griebel
    # sect. 8.1), so cap dt by the one-cell free-fall time.  gamma is
    # linear in dt, so it rescales.
    g_mag = max(abs(params.g_x), abs(params.g_y))
    if g_mag > 0.0:
        cap = params.tau * float(
            np.sqrt(2.0 * min(params.dx, params.dy) / g_mag))
        scale = jnp.minimum(1.0, cap / dt)
        dt = dt * scale
        gamma = gamma * scale
    u, v = _box_bcs(u, v, wall)
    flags = surf.cell_flags(fs.pset.x, fs.pset.y, fs.pset.active, params)
    u, v = surf.apply_surface_bcs(u, v, flags, params)

    F, G = momentum.compute_fg(u, v, dt, gamma, params)
    F, G = surf.pin_fg(F, G, u, v, flags)
    rhs = momentum.compute_rhs(F, G, dt, params)
    result = surf.solve_pressure_free(p, rhs, flags, params)
    u, v = momentum.project_velocities(u, v, F, G, result.p, dt, params)
    u, v = surf.apply_surface_bcs(u, v, flags, params)

    pset = P.advect(fs.pset, u, v, dt, params, method="heun")
    new = FreeSurfaceState(
        state=State(u=u, v=v, p=result.p, t=t + dt, n=n + 1),
        pset=pset,
    )
    diag = _solver.StepDiagnostics(
        dt=dt,
        sor_iterations=result.iterations,
        sor_res_norm=result.res_norm,
        sor_converged=result.converged,
    )
    return new, diag


@functools.lru_cache(maxsize=32)
def make_free_step_fn(params: Params, wall: str = "noslip"):
    @jax.jit
    def _step(fs: FreeSurfaceState):
        return free_step(fs, params, wall=wall)
    return _step


@functools.partial(jax.jit, static_argnums=(0, 2))
def _solve_free(params: Params, fs: FreeSurfaceState, wall: str):
    T = jnp.asarray(params.T, fs.state.t.dtype)

    def cond(carry):
        fs, _ = carry
        return fs.state.t < T

    def body(carry):
        fs, stats = carry
        fs, diag = free_step(fs, params, wall=wall)
        stats = _solver.SolveStats(
            steps=stats.steps + 1,
            total_sor_iterations=(stats.total_sor_iterations
                                  + diag.sor_iterations),
            sor_failures=stats.sor_failures
            + jnp.where(diag.sor_converged, 0, 1).astype(jnp.int32),
            last_res_norm=diag.sor_res_norm,
        )
        return fs, stats

    zero = jnp.zeros((), jnp.int32)
    stats0 = _solver.SolveStats(
        steps=zero, total_sor_iterations=zero, sor_failures=zero,
        last_res_norm=jnp.zeros((), fs.state.t.dtype))
    fs, stats = lax.while_loop(cond, body, (fs, stats0))
    return fs, stats


def solve_free(params: Params, fs: FreeSurfaceState, *,
               wall: str = "noslip",
               ) -> Tuple[FreeSurfaceState, _solver.SolveStats]:
    """Integrate to t >= T in one on-device while_loop."""
    return _solve_free(params, fs, wall)


def trace_free(params: Params, fs: FreeSurfaceState, *,
               wall: str = "noslip", record_every: int = 1):
    """Host-loop twin recording particle-history frames for
    plot_particle_paths / animation; bitwise-identical stepping."""
    step_fn = make_free_step_fn(params, wall)
    frames = [P._snapshot(fs.pset)]
    steps = iters = fails = 0
    last = 0.0
    T = float(params.T)
    while float(fs.state.t) < T:
        fs, diag = step_fn(fs)
        steps += 1
        if steps % record_every == 0:
            frames.append(P._snapshot(fs.pset))
        iters += int(diag.sor_iterations)
        fails += 0 if bool(diag.sor_converged) else 1
        last = float(diag.sor_res_norm)
    stats = _solver.SolveStats(
        steps=jnp.asarray(steps, jnp.int32),
        total_sor_iterations=jnp.asarray(iters, jnp.int32),
        sor_failures=jnp.asarray(fails, jnp.int32),
        last_res_norm=jnp.asarray(last, fs.state.t.dtype))
    return fs, stats, np.stack(frames)


# ---------------------------------------------------------------------------
# Setups.
# ---------------------------------------------------------------------------


def fill_region(params: Params, x0: float, x1: float, y0: float, y1: float,
                ppc: int = 3, dtype=None) -> P.ParticleSet:
    """Marker particles on a ppc x ppc per-cell lattice inside
    [x0,x1] x [y0,y1] (clipped to the domain).  >= 2 particles per cell
    axis is the standard guard against spurious cell emptying."""
    dx, dy = params.dx, params.dy
    sx = dx / ppc
    sy = dy / ppc
    xs = np.arange(sx / 2, params.a, sx)
    ys = np.arange(sy / 2, params.b, sy)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    keep = (gx >= x0) & (gx <= x1) & (gy >= y0) & (gy <= y1)
    pts = np.stack([gx[keep], gy[keep]], -1)
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return P.init_particles(pts, dtype=dtype)


def dam_break(n: int = 64, *, width: float = 1.0, height: float = 2.0,
              a: float = 5.0, b: float = 3.0, T: float = 2.0,
              Re: float = 1000.0, g: float = 1.0, ppc: int = 3,
              tau: float = 0.4, epsilon: float = 1e-3,
              max_it: int = 2000) -> Tuple[Params, FreeSurfaceState]:
    """Collapse of a liquid column against the left wall (Martin & Moyce
    1952; Griebel sect. 8.4.1).  `n` cells per unit length; nondimensional
    gravity g pulls in -y.  Returns (params, initial FreeSurfaceState)."""
    params = Params(problem=1, i_max=int(round(n * a)),
                    j_max=int(round(n * b)), a=a, b=b, T=T, Re=Re,
                    g_x=0.0, g_y=-g, tau=tau, omega=1.7, epsilon=epsilon,
                    max_it=max_it,
                    dtype="float64" if jax.config.jax_enable_x64
                    else "float32")
    pset = fill_region(params, 0.0, width, 0.0, height, ppc=ppc)
    return params, FreeSurfaceState(state=allocate_state(params), pset=pset)


def filled_box(n: int = 48, *, depth: float = 0.5, Re: float = 100.0,
               g: float = 1.0, T: float = 0.2, ppc: int = 3,
               epsilon: float = 1e-6, max_it: int = 5000,
               tau: float = 0.4) -> Tuple[Params, FreeSurfaceState]:
    """Liquid at rest filling y < depth of the unit box — the hydrostatic
    equilibrium case: velocities must stay ~0 and the pressure must relax
    to p(y) = g * (y_surface_center - y)."""
    params = Params(problem=1, i_max=n, j_max=n, a=1.0, b=1.0, T=T, Re=Re,
                    g_x=0.0, g_y=-g, tau=tau, omega=1.7, epsilon=epsilon,
                    max_it=max_it,
                    dtype="float64" if jax.config.jax_enable_x64
                    else "float32")
    pset = fill_region(params, 0.0, 1.0, 0.0, depth, ppc=ppc)
    return params, FreeSurfaceState(state=allocate_state(params), pset=pset)


def drop(n: int = 48, *, cx: float = 0.5, cy: float = 0.7, half: float = 0.15,
         Re: float = 10000.0, g: float = 1.0, T: float = 0.25, ppc: int = 3,
         epsilon: float = 1e-4, max_it: int = 2000,
         tau: float = 0.4) -> Tuple[Params, FreeSurfaceState]:
    """A square blob in free fall (no wall contact while airborne): its
    center of mass must follow y(t) = cy - g t^2 / 2 because a uniformly
    accelerating blob carries zero pressure gradient (rhs = div(u + dt*g)
    = 0, and the surface Dirichlet pins p = 0)."""
    params = Params(problem=1, i_max=n, j_max=n, a=1.0, b=1.0, T=T, Re=Re,
                    g_x=0.0, g_y=-g, tau=tau, omega=1.7, epsilon=epsilon,
                    max_it=max_it,
                    dtype="float64" if jax.config.jax_enable_x64
                    else "float32")
    pset = fill_region(params, cx - half, cx + half, cy - half, cy + half,
                       ppc=ppc)
    return params, FreeSurfaceState(state=allocate_state(params), pset=pset)


# ---------------------------------------------------------------------------
# Diagnostics.
# ---------------------------------------------------------------------------


def fluid_volume(fs: FreeSurfaceState, params: Params) -> float:
    """Fluid area = (# fluid cells) * dx * dy."""
    flags = surf.cell_flags(fs.pset.x, fs.pset.y, fs.pset.active, params)
    return float(jnp.sum(flags.fluid)) * params.dx * params.dy


def front_position(fs: FreeSurfaceState) -> float:
    """Rightmost active particle x — the surge-front coordinate Martin &
    Moyce photographed."""
    x = jnp.where(fs.pset.active, fs.pset.x, -jnp.inf)
    return float(jnp.max(x))


def column_height(fs: FreeSurfaceState) -> float:
    """Highest active particle y (the residual-column height at the left
    wall for the dam-break geometry)."""
    y = jnp.where(fs.pset.active, fs.pset.y, -jnp.inf)
    return float(jnp.max(y))


def center_of_mass(fs: FreeSurfaceState) -> Tuple[float, float]:
    act = fs.pset.active
    n = jnp.maximum(jnp.sum(act), 1)
    cx = jnp.sum(jnp.where(act, fs.pset.x, 0.0)) / n
    cy = jnp.sum(jnp.where(act, fs.pset.y, 0.0)) / n
    return float(cx), float(cy)
