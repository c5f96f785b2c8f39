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
