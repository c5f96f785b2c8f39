"""Energy (temperature) transport for Boussinesq thermal flows.

Beyond-reference extension (the reference, like Griebel et al. ch. 3-8,
ships only isothermal cavity flows): the standard coupling of Griebel
et al. 1998 ch. 9 — a cell-centered temperature field advected with the
same gamma-weighted donor-cell scheme as momentum and diffused with
1/(Re*Pr), feeding back into the tentative velocities as a Boussinesq
buoyancy term on the staggered faces.

Discretization (T lives at cell centers, ghost ring included, exactly
like p):

  d(uT)/dx|_{ij} = [u_ij (T_ij+T_{i+1,j})/2 - u_{i-1,j} (T_{i-1,j}+T_ij)/2] / dx
       + gamma * [|u_ij| (T_ij-T_{i+1,j})/2 - |u_{i-1,j}| (T_{i-1,j}-T_ij)/2] / dx

(the y-term mirrors it), i.e. central average + gamma-scaled donor-cell
upwinding — the T-analogue of stencils.du2_dx (integration.c:5-16 form).

Used by models/convection.py (differentially heated cavity, de Vahl
Davis benchmark).  All functions are pure jnp and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Params
from . import stencils as st


def duT_dx(u, T, dx, gamma):
    """d(uT)/dx at cell centers (interior shape)."""
    T_c = st.shifted(T, 0, 0)
    T_e = st.shifted(T, 1, 0)
    T_w = st.shifted(T, -1, 0)
    u_c = st.shifted(u, 0, 0)
    u_w = st.shifted(u, -1, 0)
    flux = u_c * (T_c + T_e) / 2.0 - u_w * (T_w + T_c) / 2.0
    don = jnp.abs(u_c) * (T_c - T_e) / 2.0 - jnp.abs(u_w) * (T_w - T_c) / 2.0
    return (flux + gamma * don) / dx


def dvT_dy(v, T, dy, gamma):
    """d(vT)/dy at cell centers (interior shape)."""
    T_c = st.shifted(T, 0, 0)
    T_n = st.shifted(T, 0, 1)
    T_s = st.shifted(T, 0, -1)
    v_c = st.shifted(v, 0, 0)
    v_s = st.shifted(v, 0, -1)
    flux = v_c * (T_c + T_n) / 2.0 - v_s * (T_s + T_c) / 2.0
    don = jnp.abs(v_c) * (T_c - T_n) / 2.0 - jnp.abs(v_s) * (T_s - T_c) / 2.0
    return (flux + gamma * don) / dy


def advance_temperature(T, u, v, dt, gamma, params: Params,
                        alpha: float) -> jax.Array:
    """Explicit energy step: T += dt (alpha lap(T) - (uT)_x - (vT)_y).

    `alpha` is the dimensionless thermal diffusivity (1/(Re Pr) in the
    Griebel scaling).  Caller applies the T boundary conditions before
    AND after (ghosts must be valid for the stencils)."""
    lap = st.d2_dx2(T, params.dx) + st.d2_dy2(T, params.dy)
    adv = duT_dx(u, T, params.dx, gamma) + dvT_dy(v, T, params.dy, gamma)
    return T.at[1:-1, 1:-1].add(dt * (alpha * lap - adv))


def buoyant_fg(F, G, T, dt, beta_gx: float, beta_gy: float):
    """Boussinesq buoyancy on the tentative velocities (Griebel ch. 9):
    the face-averaged temperature scales the thermal body force
    (replacing rho-variation): F -= dt*beta_gx*(T_ij+T_{i+1,j})/2 etc.
    With beta_gx/by = beta * g_{x,y}, a NEGATIVE beta_gy (gravity down,
    positive expansion) makes hot fluid rise."""
    # Only the LIVE tentative-velocity entries get the force: F lives at
    # i in [1, i_max-1] (F = u pinned on the left/right wall edges,
    # momentum.compute_fg), G at j in [1, j_max-1].  The skip is for
    # STATICALLY-zero coefficients only — traced scalars (the
    # differentiable path takes d/d(beta)) always take the add.
    def _static_zero(c):
        return isinstance(c, (int, float)) and c == 0.0

    if not _static_zero(beta_gx):
        T_face_x = (st.shifted(T, 0, 0) + st.shifted(T, 1, 0)) / 2.0
        F = F.at[1:-2, 1:-1].add(-dt * beta_gx * T_face_x[:-1, :])
    if not _static_zero(beta_gy):
        T_face_y = (st.shifted(T, 0, 0) + st.shifted(T, 0, 1)) / 2.0
        G = G.at[1:-1, 1:-2].add(-dt * beta_gy * T_face_y[:, :-1])
    return F, G


def apply_temperature_bcs(T, params: Params, t_left: float, t_right: float):
    """Differentially heated cavity T BCs: Dirichlet left/right walls
    (ghost reflection so the wall value is the ghost/interior average),
    adiabatic (homogeneous Neumann) top/bottom."""
    T = T.at[0, 1:-1].set(2.0 * t_left - T[1, 1:-1])
    T = T.at[-1, 1:-1].set(2.0 * t_right - T[-2, 1:-1])
    T = T.at[1:-1, 0].set(T[1:-1, 1])
    T = T.at[1:-1, -1].set(T[1:-1, -2])
    return T


def apply_temperature_bcs_rb(T, params: Params, t_bottom: float,
                             t_top: float):
    """Rayleigh-Benard T BCs — the 90-degree-rotated twin of
    apply_temperature_bcs: conducting (Dirichlet) bottom/top plates via
    ghost reflection, adiabatic (homogeneous Neumann) sidewalls.  Used by
    the heated-from-below members of the Boussinesq family
    (models/convection.py::rayleigh_benard_setup)."""
    T = T.at[1:-1, 0].set(2.0 * t_bottom - T[1:-1, 1])
    T = T.at[1:-1, -1].set(2.0 * t_top - T[1:-1, -2])
    T = T.at[0, 1:-1].set(T[1, 1:-1])
    T = T.at[-1, 1:-1].set(T[-2, 1:-1])
    return T


def apply_obstacle_temperature_bcs(T, params: Params,
                                   t_obstacle=None):
    """Temperature condition on interior obstacle cells (Griebel ch. 9
    heated-obstacle treatment): every solid cell with at least one fluid
    4-neighbor acts as a T ghost for those neighbors' stencils —

      * `t_obstacle` None: ADIABATIC obstacle — the solid cell copies the
        mean of its adjacent fluid temperatures (homogeneous Neumann,
        exactly how the domain walls' adiabatic ghosts copy the interior
        row in apply_temperature_bcs).
      * `t_obstacle` float (or traced scalar): ISOTHERMAL obstacle at
        that temperature — solid value = 2 t_obs - mean(adjacent fluid T)
        so the face average is t_obs, exactly the domain-wall Dirichlet
        reflection.  A corner solid cell with two fluid neighbors gets
        one value serving both directions (the reflection then holds for
        their MEAN — the same O(dx) corner compromise the NaSt2D lineage
        makes; obstacles are >= 2 cells thick so no cell ever faces two
        OPPOSITE fluid sides).

    Deep solid cells (no fluid neighbor) hold t_obstacle (or stay
    untouched when adiabatic) — they never enter any stencil.  Masks are
    static (params.obstacles), so everything folds into the jit program.
    """
    if not params.obstacles:
        return T
    import numpy as np
    from .obstacles import fluid_mask

    fl = fluid_mask(params)
    interior = np.zeros_like(fl)
    interior[1:-1, 1:-1] = True
    solid = interior & ~fl
    nb_cnt = np.zeros(fl.shape, np.int32)
    pads = ((1, 0), (-1, 0), (0, 1), (0, -1))
    for di, dj in pads:
        nb_cnt[1:-1, 1:-1] += fl[1 + di:fl.shape[0] - 1 + di,
                                 1 + dj:fl.shape[1] - 1 + dj]
    boundary_solid = solid & (nb_cnt > 0)
    deep_solid = solid & (nb_cnt == 0)
    flj = jnp.asarray(fl)
    nb_sum = jnp.zeros_like(T)
    for di, dj in pads:
        shifted = jnp.roll(T * flj, (-di, -dj), (0, 1))
        nb_sum = nb_sum + shifted
    mean_nb = nb_sum / jnp.maximum(jnp.asarray(nb_cnt, T.dtype), 1)
    if t_obstacle is None:
        val = mean_nb
        T = jnp.where(jnp.asarray(boundary_solid), val, T)
    else:
        val = 2.0 * t_obstacle - mean_nb
        T = jnp.where(jnp.asarray(boundary_solid), val, T)
        T = jnp.where(jnp.asarray(deep_solid),
                      jnp.asarray(t_obstacle, T.dtype), T)
    return T


def thermal_dt_limit(params: Params, alpha: float):
    """Explicit-diffusion stability bound for the energy equation:
    dt <= 1/(2 alpha) / (1/dx^2 + 1/dy^2) — the thermal analogue of the
    viscous limit in adaptive_dt_gamma (main.c:89-92)."""
    dx, dy = params.dx, params.dy
    return 1.0 / (2.0 * alpha) / (1.0 / (dx * dx) + 1.0 / (dy * dy))
