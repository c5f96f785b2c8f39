"""Multi-chip Boussinesq thermal flows on the manual shard_map backend.

Closes the last multi-chip composition gap: the flagship
communication-avoiding sharded path (parallel/sharded.py — deep-halo
rb_sor/pallas_sor, sharded mg/fft/cg) now carries the energy equation, so
problem-5 / Rayleigh-Benard runs are no longer GSPMD-only.  The design is
the sharded isothermal step plus exactly three thermal pieces, each the
block-local twin of its single-chip form (models/convection.py::
thermal_step — the parity contract here is that twin, to the repo-wide
1e-4 oracle tolerance):

  * temperature boundary conditions as global-index-masked roll updates
    (`_apply_t_bcs_sharded`): Dirichlet ghost reflections on the heated
    pair of walls (side-heated de Vahl Davis or bottom-heated
    Rayleigh-Benard, per ThermalConfig.heating) and homogeneous-Neumann
    adiabatic copies on the other pair — the same masked-write machinery
    as the velocity BCs, so they land wherever the TRUE ghost line falls
    under pad-to-divisible sharding;
  * the energy step on local padded blocks: one ppermute halo exchange
    per field per step makes every donor-cell/diffusion stencil read
    shard-locally valid (ops/energy.py::advance_temperature is reused
    UNCHANGED — it is pure local stencil arithmetic);
  * the Boussinesq buoyancy source masked to the globally LIVE tentative
    velocity entries (gi <= i_max-1 for F, gj <= j_max-1 for G — the
    sharded image of energy.buoyant_fg's static slices), applied before
    the F/G halo fill so neighbor shards' divergence reads see the
    buoyant values.

The pressure solve is byte-shared with the isothermal path
(sharded._sharded_pressure_solve): deep-halo communication-avoiding
rb_sor/pallas_sor, sharded multigrid, pencil-fft, cg — every sharded
pressure method works under thermal coupling unmodified.

Reference analogue: none — the reference is isothermal and single-GPU
(SURVEY.md §2.4); the halo structure generalizes its shared-memory tile
design (main.cu:384-511) to a fourth transported field.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Params
from ..ops import energy
from ..solver import SolveStats, StepDiagnostics
from . import halo
from .sharded import (
    _apply_bcs_sharded,
    _check_method,
    _fetch_blocks,
    _gather_blocks,
    _local_fg,
    _put_blocks,
    _scatter_blocks,
    _sharded_pressure_solve,
    _valid_mask_or_none,
    shard_map,
)
from .topology import MESH_AXES, grid_sharding, make_grid_mesh


def _check_thermal(params: Params, cfg, mesh: Mesh, pressure_method: str):
    """Thermal-specific contract on top of sharded._check_method."""
    if params.obstacles:
        raise ValueError(
            "sharded thermal runs do not compose with obstacle domains "
            "yet — use --backend gspmd (heated/adiabatic blocks work "
            "there) or single-chip")
    if cfg.heating not in ("side", "below"):
        raise ValueError(f"unknown heating mode {cfg.heating!r}")
    if cfg.sidewalls == "freeslip":
        if not (isinstance(cfg.lid_u, (int, float)) and cfg.lid_u == 0.0):
            raise ValueError("lid_u requires sidewalls='noslip'")
    elif cfg.sidewalls != "noslip":
        raise ValueError(f"unknown sidewall mode {cfg.sidewalls!r}")
    return _check_method(params, mesh, pressure_method)


def _apply_thermal_vel_bcs_sharded(u, v, params: Params, cfg):
    """Sharded twin of convection._apply_vel_bcs: rigid no-slip plates
    with sidewalls per cfg.sidewalls (free-slip sidewalls are the
    Rayleigh-Benard roll symmetry planes).  Same masked-roll machinery
    and LEFT, RIGHT, BOTTOM, TOP order as sharded._apply_bcs_sharded."""
    if cfg.sidewalls != "freeslip":
        return _apply_bcs_sharded(u, v, jnp.asarray(cfg.lid_u, u.dtype),
                                  params)
    I, J = params.i_max, params.j_max
    u = halo.exchange_halo(u)
    v = halo.exchange_halo(v)
    gi, gj = halo.padded_global_indices(u.shape)
    in_j = (gj >= 1) & (gj <= J)
    in_i = (gi >= 1) & (gi <= I)
    # LEFT / RIGHT free-slip: zero normal edge, zero-gradient tangential.
    u = jnp.where((gi == 0) & in_j, jnp.zeros_like(u), u)
    v = jnp.where((gi == 0) & in_j, jnp.roll(v, -1, 0), v)
    u = jnp.where((gi == I) & in_j, jnp.zeros_like(u), u)
    v = jnp.where((gi == I + 1) & in_j, jnp.roll(v, 1, 0), v)
    # BOTTOM / TOP rigid no-slip plates (no lid).
    v = jnp.where(in_i & (gj == 0), jnp.zeros_like(v), v)
    u = jnp.where(in_i & (gj == 0), -jnp.roll(u, -1, 1), u)
    v = jnp.where(in_i & (gj == J), jnp.zeros_like(v), v)
    u = jnp.where(in_i & (gj == J + 1), -jnp.roll(u, 1, 1), u)
    return u, v


def _apply_t_bcs_sharded(T, params: Params, cfg):
    """Sharded twin of convection._apply_t_bcs (ops/energy.py
    apply_temperature_bcs / _rb): Dirichlet ghost reflection on the
    heated wall pair, adiabatic zero-gradient copy on the other, as
    masked roll updates valid at halo positions too."""
    I, J = params.i_max, params.j_max
    T_pre = T
    T = halo.exchange_halo(T)
    gi, gj = halo.padded_global_indices(T.shape)
    in_j = (gj >= 1) & (gj <= J)
    in_i = (gi >= 1) & (gi <= I)
    hot = jnp.asarray(cfg.t_left, T.dtype)
    cold = jnp.asarray(cfg.t_right, T.dtype)
    # The four GLOBAL ghost corners: the single-chip BC functions never
    # write them (they keep their allocate_thermal values forever), but on
    # divisible grids they sit on a corner shard's halo ring, which
    # exchange_halo zeroes.  Restore the carried value so output-file
    # ghost parity holds (no stencil ever reads a global corner).
    corner = ((gi == 0) | (gi == I + 1)) & ((gj == 0) | (gj == J + 1))
    if cfg.heating == "below":
        # Conducting bottom/top plates, adiabatic sidewalls.
        T = jnp.where(in_i & (gj == 0), 2.0 * hot - jnp.roll(T, -1, 1), T)
        T = jnp.where(in_i & (gj == J + 1),
                      2.0 * cold - jnp.roll(T, 1, 1), T)
        T = jnp.where((gi == 0) & in_j, jnp.roll(T, -1, 0), T)
        T = jnp.where((gi == I + 1) & in_j, jnp.roll(T, 1, 0), T)
    else:
        # Hot left / cold right walls, adiabatic top/bottom.
        T = jnp.where((gi == 0) & in_j, 2.0 * hot - jnp.roll(T, -1, 0), T)
        T = jnp.where((gi == I + 1) & in_j,
                      2.0 * cold - jnp.roll(T, 1, 0), T)
        T = jnp.where(in_i & (gj == 0), jnp.roll(T, -1, 1), T)
        T = jnp.where(in_i & (gj == J + 1), jnp.roll(T, 1, 1), T)
    return jnp.where(corner, T_pre, T)


def _sharded_thermal_step(u, v, p, T, t, params: Params, cfg,
                          pressure_method: str):
    """One Boussinesq time step on local padded blocks — the sharded twin
    of convection.thermal_step (same Griebel ch. 9 ordering: T advances
    first with the old velocities, momentum uses the NEW temperature)."""
    li, lj = u.shape[0] - 2, u.shape[1] - 2
    dx, dy = params.dx, params.dy
    valid, gi, gj = _valid_mask_or_none(params, li, lj)

    def mask_pad(arr_int):
        return arr_int if valid is None else jnp.where(
            valid, arr_int, jnp.zeros_like(arr_int))

    # CFL dt with the thermal explicit-diffusion bound.  The pmax'd
    # signed maxima seeded with 0 reproduce st.max_interior's ghost-corner
    # seed (u[0,0] is provably 0 under every thermal BC family here).
    u_max = jnp.maximum(0.0, lax.pmax(jnp.max(mask_pad(u[1:-1, 1:-1])),
                                      MESH_AXES))
    v_max = jnp.maximum(0.0, lax.pmax(jnp.max(mask_pad(v[1:-1, 1:-1])),
                                      MESH_AXES))
    visc = params.Re / 2.0 / (1.0 / (dx * dx) + 1.0 / (dy * dy))
    dt = params.tau * jnp.minimum(
        jnp.minimum(visc, energy.thermal_dt_limit(params, cfg.alpha)),
        jnp.minimum(dx / jnp.abs(u_max), dy / jnp.abs(v_max)))
    if params.gamma_fixed is not None:
        # Fixed upwind weight (config.py::gamma_fixed).
        gamma = jnp.asarray(params.gamma_fixed, dt.dtype)
    else:
        gamma = jnp.maximum(u_max * dt / dx, v_max * dt / dy)

    u, v = _apply_thermal_vel_bcs_sharded(u, v, params, cfg)
    T = _apply_t_bcs_sharded(T, params, cfg)
    # Energy step: pure local stencils — u/v/T halos are valid after the
    # BC twins above (each exchanges, then masked-writes consistently at
    # halo positions).  Under pad-to-divisible sharding the update is
    # masked to the TRUE global interior: a locally-interior cell can be
    # a global ghost/pad position (e.g. the far ghost corner inside a pad
    # shard), which the single-chip advance never touches.
    T_new = energy.advance_temperature(T, u, v, dt, gamma, params,
                                       cfg.alpha)
    if valid is not None:
        T_new = T_new.at[1:-1, 1:-1].set(
            jnp.where(valid, T_new[1:-1, 1:-1], T[1:-1, 1:-1]))
    T_new = _apply_t_bcs_sharded(T_new, params, cfg)

    F, G = _local_fg(u, v, dt, gamma, params, gi, gj)
    F, G = _buoyant_fg_sharded(F, G, T_new, u, v, dt, params, cfg, gi, gj)

    rhs_int = mask_pad(
        (
            (F[1:-1, 1:-1] - F[:-2, 1:-1]) / dx
            + (G[1:-1, 1:-1] - G[1:-1, :-2]) / dy
        )
        / dt
    )
    rhs = jnp.zeros_like(p).at[1:-1, 1:-1].set(rhs_int)

    result = _sharded_pressure_solve(p, rhs, params, pressure_method,
                                     li, lj, valid, gi, gj)
    p = result.p

    u_new = F[1:-1, 1:-1] - dt * (p[2:, 1:-1] - p[1:-1, 1:-1]) / dx
    v_new = G[1:-1, 1:-1] - dt * (p[1:-1, 2:] - p[1:-1, 1:-1]) / dy
    u = u.at[1:-1, 1:-1].set(
        jnp.where((gi <= params.i_max - 1) & (gj <= params.j_max),
                  u_new, u[1:-1, 1:-1])
    )
    v = v.at[1:-1, 1:-1].set(
        jnp.where((gj <= params.j_max - 1) & (gi <= params.i_max),
                  v_new, v[1:-1, 1:-1])
    )
    return u, v, p, T_new, dt, result


def _buoyant_fg_sharded(F, G, T, u, v, dt, params: Params, cfg, gi, gj):
    """Boussinesq buoyancy on local tentative-velocity blocks — the
    global-index-masked image of energy.buoyant_fg's static slices
    (F entries live at i in [1, i_max-1], G at j in [1, j_max-1]).  The
    F/G neighbor halo strips are refilled afterwards so the divergence's
    cross-seam reads carry the buoyant values (sharded._local_fg fills
    them pre-buoyancy)."""

    def _static_zero(c):
        return isinstance(c, (int, float)) and c == 0.0

    if _static_zero(cfg.beta_gx) and _static_zero(cfg.beta_gy):
        return F, G
    I, J = params.i_max, params.j_max
    # T halos are valid (caller applies the sharded T BCs), so the east/
    # north face averages are shard-locally exact.
    if not _static_zero(cfg.beta_gx):
        face_x = (T[1:-1, 1:-1] + T[2:, 1:-1]) / 2.0
        F = F.at[1:-1, 1:-1].add(jnp.where(
            (gi <= I - 1) & (gj <= J),
            -dt * cfg.beta_gx * face_x, jnp.zeros_like(face_x)))
    if not _static_zero(cfg.beta_gy):
        face_y = (T[1:-1, 1:-1] + T[1:-1, 2:]) / 2.0
        G = G.at[1:-1, 1:-1].add(jnp.where(
            (gj <= J - 1) & (gi <= I),
            -dt * cfg.beta_gy * face_y, jnp.zeros_like(face_y)))
    # Refill the west/south halo strips (the EXACT closure _local_fg
    # applies — its fill ran pre-buoyancy, so cross-seam divergence reads
    # would otherwise miss the neighbor's buoyant contribution).
    F = F.at[0, :].set(halo._shift_up(F[-2, :], "x"))
    G = G.at[:, 0].set(halo._shift_up(G[:, -2], "y"))
    edges = halo.edge_masks()
    F = F.at[0, :].set(jnp.where(edges["left"], u[0, :], F[0, :]))
    G = G.at[:, 0].set(jnp.where(edges["bottom"], v[:, 0], G[:, 0]))
    return F, G


def _local_thermal_solve(u, v, p, T, t0, params: Params, cfg,
                         pressure_method: str):
    """Full `while t < T_end` on local padded blocks; runs inside
    shard_map (the thermal twin of sharded._local_solve)."""
    T_end = jnp.asarray(params.T, t0.dtype)
    zero = jnp.zeros((), jnp.int32)

    def cond(carry):
        _, _, _, _, t, _ = carry
        return t < T_end

    def body(carry):
        u, v, p, T, t, stats = carry
        u, v, p, T, dt, result = _sharded_thermal_step(
            u, v, p, T, t, params, cfg, pressure_method)
        stats = SolveStats(
            steps=stats.steps + 1,
            total_sor_iterations=stats.total_sor_iterations
            + result.iterations,
            sor_failures=stats.sor_failures
            + jnp.where(result.converged, 0, 1).astype(jnp.int32),
            last_res_norm=result.res_norm.astype(t.dtype),
        )
        return u, v, p, T, t + dt, stats

    stats0 = SolveStats(
        steps=zero, total_sor_iterations=zero, sor_failures=zero,
        last_res_norm=jnp.zeros((), t0.dtype),
    )
    u, v, p, T, t, stats = lax.while_loop(
        cond, body, (u, v, p, T, t0, stats0))
    return u, v, p, T, t, stats


def make_sharded_thermal_step_fn(params: Params, cfg, mesh: Mesh,
                                 pressure_method: str = "rb_sor"):
    """Jitted shard_mapped single thermal step over block-concatenated
    padded arrays (u, v, p, T, t) -> (u, v, p, T, t+dt, dt, iters,
    res_norm, converged)."""
    _check_thermal(params, cfg, mesh, pressure_method)
    spec = P(*MESH_AXES)

    def local_step(u, v, p, T, t):
        u, v, p, T, dt, result = _sharded_thermal_step(
            u, v, p, T, t, params, cfg, pressure_method)
        return (u, v, p, T, t + dt, dt, result.iterations, result.res_norm,
                result.converged)

    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P()),
        out_specs=(spec, spec, spec, spec, P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=32)
def make_sharded_thermal_solve(params: Params, cfg, mesh: Mesh,
                               pressure_method: str = "rb_sor"):
    _check_thermal(params, cfg, mesh, pressure_method)
    spec = P(*MESH_AXES)
    fn = functools.partial(_local_thermal_solve, params=params, cfg=cfg,
                           pressure_method=pressure_method)
    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P()),
        out_specs=(spec, spec, spec, spec, P(),
                   SolveStats(P(), P(), P(), P())),
        check_vma=False,
    )
    return jax.jit(mapped)


class ThermalShardedStepper:
    """Host-loop adapter for sharded problem-5 runs (periodic output /
    checkpoint / history through cli._run_host_loop) — the thermal twin
    of sharded.ShardedStepper."""

    def __init__(self, params: Params, cfg, state, mesh: Optional[Mesh] = None,
                 pressure_method: str = "rb_sor"):
        if mesh is None:
            mesh = make_grid_mesh(i_max=params.i_max, j_max=params.j_max)
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        self.px, self.py, self.li, self.lj = _check_thermal(
            params, cfg, mesh, pressure_method)
        self._sharding = grid_sharding(mesh)
        self._step_fn = make_sharded_thermal_step_fn(params, cfg, mesh,
                                                     pressure_method)
        dims = (self.px, self.py, self.li, self.lj)
        self._u = _put_blocks(_scatter_blocks(state.u, *dims), self._sharding)
        self._v = _put_blocks(_scatter_blocks(state.v, *dims), self._sharding)
        self._p = _put_blocks(_scatter_blocks(state.p, *dims), self._sharding)
        self._T = _put_blocks(_scatter_blocks(state.T, *dims), self._sharding)
        self._t = jnp.asarray(state.t)
        self._n = int(state.n)

    @property
    def t(self) -> float:
        return float(self._t)

    @property
    def n(self) -> int:
        return self._n

    def warm(self) -> None:
        self._step_fn = self._step_fn.lower(
            self._u, self._v, self._p, self._T, self._t).compile()

    def step(self) -> StepDiagnostics:
        (self._u, self._v, self._p, self._T, self._t, dt, iters, res_norm,
         converged) = self._step_fn(self._u, self._v, self._p, self._T,
                                    self._t)
        self._n += 1
        return StepDiagnostics(dt=dt, sor_iterations=iters,
                               sor_res_norm=res_norm,
                               sor_converged=converged)

    def state(self):
        from ..models.convection import ThermalState

        dims = (self.px, self.py, self.li, self.lj)
        shape = self.params.shape
        return ThermalState(
            u=jnp.asarray(_gather_blocks(_fetch_blocks(self._u), *dims,
                                         shape)),
            v=jnp.asarray(_gather_blocks(_fetch_blocks(self._v), *dims,
                                         shape)),
            p=jnp.asarray(_gather_blocks(_fetch_blocks(self._p), *dims,
                                         shape)),
            T=jnp.asarray(_gather_blocks(_fetch_blocks(self._T), *dims,
                                         shape)),
            t=self._t,
            n=jnp.asarray(self._n, jnp.int32),
        )


# Compiled-executable cache (same rationale as sharded._SOLVE_EXEC_CACHE).
_SOLVE_EXEC_CACHE: dict = {}


def compile_sharded_thermal_solve(
    params: Params,
    cfg,
    state=None,
    mesh: Optional[Mesh] = None,
    *,
    pressure_method: str = "rb_sor",
):
    """Scatter the ThermalState and AOT-compile the full sharded thermal
    solve; returns `run() -> (ThermalState, SolveStats)` with
    `.run_device()` / `.gather()` split for device-phase-only timing
    (docs/performance.md measurement notes)."""
    from ..models.convection import ThermalState, allocate_thermal

    if state is None:
        state = allocate_thermal(params, cfg)
    if mesh is None:
        mesh = make_grid_mesh(i_max=params.i_max, j_max=params.j_max)

    px, py, li, lj = _check_thermal(params, cfg, mesh, pressure_method)
    sharding = grid_sharding(mesh)
    dims = (px, py, li, lj)
    u = _put_blocks(_scatter_blocks(state.u, *dims), sharding)
    v = _put_blocks(_scatter_blocks(state.v, *dims), sharding)
    p = _put_blocks(_scatter_blocks(state.p, *dims), sharding)
    T = _put_blocks(_scatter_blocks(state.T, *dims), sharding)
    t0 = jnp.asarray(state.t)

    key = (params, cfg, mesh, pressure_method, str(u.dtype), str(t0.dtype))
    compiled = _SOLVE_EXEC_CACHE.get(key)
    if compiled is None:
        solve_fn = make_sharded_thermal_solve(params, cfg, mesh,
                                              pressure_method)
        compiled = solve_fn.lower(u, v, p, T, t0).compile()
        if len(_SOLVE_EXEC_CACHE) >= 32:
            _SOLVE_EXEC_CACHE.clear()
        _SOLVE_EXEC_CACHE[key] = compiled

    def run_device():
        return compiled(u, v, p, T, t0)

    def gather(outs) -> Tuple:
        uo, vo, po, To, t, stats = outs
        shape = params.shape
        new_state = ThermalState(
            u=jnp.asarray(_gather_blocks(_fetch_blocks(uo), *dims, shape)),
            v=jnp.asarray(_gather_blocks(_fetch_blocks(vo), *dims, shape)),
            p=jnp.asarray(_gather_blocks(_fetch_blocks(po), *dims, shape)),
            T=jnp.asarray(_gather_blocks(_fetch_blocks(To), *dims, shape)),
            t=t,
            n=state.n + stats.steps,
        )
        return new_state, stats

    def run():
        return gather(run_device())

    run.run_device = run_device
    run.gather = gather
    return run


def solve_sharded_thermal(
    params: Params,
    cfg,
    state=None,
    mesh: Optional[Mesh] = None,
    *,
    pressure_method: str = "rb_sor",
):
    """Sharded drop-in for convection.thermal_solve(): scatter ->
    on-device `while t < T` -> gather, returning a reference-layout
    ThermalState."""
    return compile_sharded_thermal_solve(
        params, cfg, state, mesh, pressure_method=pressure_method)()
