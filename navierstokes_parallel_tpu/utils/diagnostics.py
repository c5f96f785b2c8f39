"""Derived-field diagnostics: stream function, vorticity, primary vortex.

The reference ships no derived-field post-processing at all (its tooling
stops at speed/quiver and pressure plots, src/plot_field.py /
src/plot_pressure.py); the stream function is the standard lid-driven
cavity diagnostic — Ghia et al. 1982 Table III reports the primary
vortex's stream-function value and center location per Reynolds number —
and provides an INDEPENDENT physics check on top of the centerline
profiles: psi is the y-cumulative flux integral of u, so its interior
extremum tests the whole 2D field, not just two centerlines.

Staggered-grid conventions (src/serial/memory.c:3-26 layout): u[i][j]
lives at (i*dx, (j-0.5)*dy), v[i][j] at ((i-0.5)*dx, j*dy).  The stream
function and vorticity are therefore naturally defined at CELL CORNERS
(i*dx, j*dy), where the discrete u = d(psi)/dy and omega = dv/dx - du/dy
differences are exactly centered.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Params

# Ghia et al. (1982) Table III: primary-vortex stream function (psi at the
# vortex center) and the center's (x, y) location, per Re.  Transcribed
# from the published tables; like the centerline tables these were
# cross-validated against this framework's own converged solutions
# (docs/performance.md records the measured agreement).
GHIA_PSI_MIN: Dict[int, float] = {
    100: -0.103423,
    400: -0.113909,
    1000: -0.117929,
    10000: -0.119731,
}
GHIA_VORTEX_CENTER: Dict[int, Tuple[float, float]] = {
    100: (0.6172, 0.7344),
    400: (0.5547, 0.6055),
    1000: (0.5313, 0.5625),
    10000: (0.5117, 0.5333),
}


def stream_function(u, params: Params) -> jnp.ndarray:
    """psi on the (i_max+1, j_max+1) corner grid, psi(x, 0) = 0 on the
    floor: psi[i, j] = sum_{k<=j} u[i][k] * dy — the exact discrete
    antiderivative of the staggered u (u[i][j] spans corners (i, j-1) and
    (i, j)).  For a discretely divergence-free field this is
    path-independent up to the projection residual, so no Poisson solve is
    needed.  Runs as two fused XLA ops (slice + cumsum) on device."""
    u = jnp.asarray(u)
    inner = u[: params.i_max + 1, 1: params.j_max + 1] * params.dy
    psi = jnp.cumsum(inner, axis=1)
    return jnp.pad(psi, ((0, 0), (1, 0)))


def vorticity(u, v, params: Params) -> jnp.ndarray:
    """omega = dv/dx - du/dy on the (i_max+1, j_max+1) corner grid: both
    differences of the staggered components are exactly centered at the
    corners (wall-ring corners read one ghost value each, which carry the
    reflected BC tangential velocities)."""
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    ni, nj = params.i_max, params.j_max
    dvdx = (v[1: ni + 2, : nj + 1] - v[: ni + 1, : nj + 1]) / params.dx
    dudy = (u[: ni + 1, 1: nj + 2] - u[: ni + 1, : nj + 1]) / params.dy
    return dvdx - dudy


class Monitors(NamedTuple):
    """Scalar physics monitors for in-flight run health (all jnp scalars;
    the tuple is jit-returnable)."""
    kinetic_energy: jnp.ndarray   # 0.5 * integral of |velocity|^2
    enstrophy: jnp.ndarray        # 0.5 * integral of vorticity^2
    max_divergence: jnp.ndarray   # worst cell continuity violation
    psi_min: jnp.ndarray          # primary-vortex strength


def physics_monitors(u, v, params: Params) -> Monitors:
    """On-device scalar monitors, one fused XLA program when jitted.

    The reference has no run-time physics monitoring at all (its
    commented-out residual print, src/serial/integration.c:162, is the
    closest thing); these are the standard time-series a production run
    watches:

    * kinetic energy  0.5*sum(u_c^2 + v_c^2)*dx*dy over cell centers
      (face velocities averaged to centers) — boundedness check: for the
      lid-driven cavity it must stay below the lid-scale value and
      plateau at the steady state.
    * enstrophy       0.5*sum(omega^2)*dx*dy over interior corners —
      blow-up detector (gradient-scale energy).
    * max_divergence  max |du/dx + dv/dy| over cells — how well the
      projection enforced continuity this step; tracks the pressure
      solve's stopping residual (eps) and jumps when SOR hits max_it.
    * psi_min         primary-vortex strength (Ghia Table III quantity).
    """
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    ni, nj = params.i_max, params.j_max
    dxdy = params.dx * params.dy

    # Cell-centered velocity magnitudes (cells i=1..ni, j=1..nj).
    u_c = 0.5 * (u[0: ni, 1: nj + 1] + u[1: ni + 1, 1: nj + 1])
    v_c = 0.5 * (v[1: ni + 1, 0: nj] + v[1: ni + 1, 1: nj + 1])
    ke = 0.5 * jnp.sum(u_c * u_c + v_c * v_c) * dxdy

    om = vorticity(u, v, params)[1:-1, 1:-1]  # interior corners only:
    # the wall ring's one-sided ghost differences would double-count the
    # lid's velocity jump as a spurious O(1/dy) vorticity band.
    ens = 0.5 * jnp.sum(om * om) * dxdy

    div = ((u[1: ni + 1, 1: nj + 1] - u[0: ni, 1: nj + 1]) / params.dx
           + (v[1: ni + 1, 1: nj + 1] - v[1: ni + 1, 0: nj]) / params.dy)
    max_div = jnp.max(jnp.abs(div))

    psi_min = jnp.min(stream_function(u, params))
    return Monitors(kinetic_energy=ke, enstrophy=ens,
                    max_divergence=max_div, psi_min=psi_min)


class PrimaryVortex(NamedTuple):
    psi: float   # stream-function value at the vortex center
    x: float     # center location
    y: float


def primary_vortex(psi, params: Params) -> PrimaryVortex:
    """The cavity's primary (clockwise) vortex: the interior minimum of
    psi and its corner-grid location.  Matches Ghia Table III's reported
    quantity (their psi at the primary-vortex center)."""
    psi = np.asarray(psi)
    idx = np.unravel_index(np.argmin(psi), psi.shape)
    return PrimaryVortex(
        psi=float(psi[idx]),
        x=float(idx[0] * params.dx),
        y=float(idx[1] * params.dy),
    )


class VortexErrors(NamedTuple):
    psi_rel_err: float    # |psi_min - Ghia| / |Ghia|
    center_dist: float    # Euclidean distance of centers


def ghia_vortex_errors(u, params: Params, Re: int) -> VortexErrors:
    """Deviation of the computed primary vortex from Ghia Table III."""
    if Re not in GHIA_PSI_MIN:
        raise ValueError(
            f"no Ghia vortex data for Re={Re} (have {list(GHIA_PSI_MIN)})")
    vort = primary_vortex(stream_function(u, params), params)
    ref_psi = GHIA_PSI_MIN[Re]
    rx, ry = GHIA_VORTEX_CENTER[Re]
    return VortexErrors(
        psi_rel_err=abs(vort.psi - ref_psi) / abs(ref_psi),
        center_dist=float(np.hypot(vort.x - rx, vort.y - ry)),
    )
