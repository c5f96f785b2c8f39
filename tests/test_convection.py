"""Natural-convection (Boussinesq) model family tests.

Validation ladder: exact conduction fixed point -> buoyancy direction ->
the de Vahl Davis benchmark Nusselt number (the standard quantitative
natural-convection test, 0.2%-level agreement at 32² already).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_parallel_tpu.models import convection as cv
from navierstokes_parallel_tpu.ops import energy


def test_conduction_fixed_point():
    """With buoyancy off, the linear conduction profile at rest is an
    EXACT fixed point: advection vanishes (u=0), the second difference of
    a linear profile is zero, and both wall Nusselt numbers are exactly 1."""
    params, cfg = cv.convection_setup(1e3, n=16, dtype="float64")
    cfg = cfg._replace(beta_gy=0.0)
    state = cv.allocate_thermal(params, cfg)
    T0 = np.asarray(state.T)
    s = state
    for _ in range(5):
        s, (dt, max_dT, res) = cv.thermal_step(s, params, cfg,
                                               pressure_method="mg")
    np.testing.assert_allclose(np.asarray(s.T), T0, atol=1e-12)
    assert float(jnp.max(jnp.abs(s.u))) < 1e-12
    assert float(jnp.max(jnp.abs(s.v))) < 1e-12
    assert cv.nusselt_hot_wall(s.T, params) == pytest.approx(1.0, abs=1e-10)
    assert cv.nusselt_cold_wall(s.T, params) == pytest.approx(1.0, abs=1e-10)


def test_buoyancy_direction():
    """Hot fluid rises: after a few coupled steps, v > 0 along the hot
    (left) wall region and v < 0 along the cold wall region."""
    params, cfg = cv.convection_setup(1e4, n=16, dtype="float64")
    s = cv.allocate_thermal(params, cfg)
    for _ in range(12):
        s, _ = cv.thermal_step(s, params, cfg, pressure_method="mg")
    v = np.asarray(s.v)
    mid = params.j_max // 2
    assert v[2, mid] > 0, "hot-wall fluid must rise"
    assert v[-3, mid] < 0, "cold-wall fluid must sink"


def test_devahl_davis_ra1e3():
    """Mean hot-wall Nusselt at Ra=1e3 vs de Vahl Davis: 1.118.  Measured
    1.1201 at 32² (0.2% — donor-cell at this Ra is nearly exact); assert
    2% plus the steady-state wall balance (energy conservation)."""
    params, cfg = cv.convection_setup(1e3, n=32)
    state, info = cv.solve_convection(params, cfg, pressure_method="fft",
                                      steady_tol=1e-5)
    assert info["steady"]
    assert info["sor_failures"] == 0
    nu_h = cv.nusselt_hot_wall(state.T, params)
    nu_c = cv.nusselt_cold_wall(state.T, params)
    assert nu_h == pytest.approx(cv.DE_VAHL_DAVIS_NU[1e3], rel=0.02)
    assert nu_h == pytest.approx(nu_c, rel=0.005)


def test_centro_symmetry():
    """The steady de Vahl Davis solution is centro-symmetric:
    T(x, y) = -T(1-x, 1-y)."""
    params, cfg = cv.convection_setup(1e3, n=32)
    state, _ = cv.solve_convection(params, cfg, pressure_method="fft",
                                   steady_tol=1e-5)
    T = np.asarray(state.T)[1:-1, 1:-1]
    np.testing.assert_allclose(T, -T[::-1, ::-1], atol=2e-3)


def test_thermal_dt_limit_respected():
    """The coupled step's dt must respect BOTH the viscous and thermal
    explicit stability bounds."""
    params, cfg = cv.convection_setup(1e5, n=16, dtype="float64")
    s = cv.allocate_thermal(params, cfg)
    s2, (dt, _, _) = cv.thermal_step(s, params, cfg, pressure_method="mg")
    dx = params.dx
    visc = params.Re / 2.0 / (2.0 / (dx * dx))
    therm = energy.thermal_dt_limit(params, cfg.alpha)
    assert float(dt) <= params.tau * min(visc, therm) + 1e-15


def test_buoyancy_preserves_pinned_fg():
    """buoyant_fg must not touch the wall-pinned F/G entries (F = u on
    the left/right edges, G = v on bottom/top — momentum.compute_fg)."""
    from navierstokes_parallel_tpu.grid import allocate_state
    from navierstokes_parallel_tpu.ops import momentum

    params, cfg = cv.convection_setup(1e3, n=8, dtype="float64")
    ts = cv.allocate_thermal(params, cfg)
    base = allocate_state(params)
    u = base.u + 0.1
    v = base.v + 0.2
    F, G = momentum.compute_fg(u, v, 0.01, 0.5, params)
    F2, G2 = energy.buoyant_fg(F, G, ts.T, 0.01, 0.3, -1.0)
    np.testing.assert_array_equal(np.asarray(F2)[0, :], np.asarray(F)[0, :])
    np.testing.assert_array_equal(np.asarray(F2)[params.i_max, :],
                                  np.asarray(F)[params.i_max, :])
    np.testing.assert_array_equal(np.asarray(G2)[:, 0], np.asarray(G)[:, 0])
    np.testing.assert_array_equal(np.asarray(G2)[:, params.j_max],
                                  np.asarray(G)[:, params.j_max])
    # ...and it must change the live interior.
    assert np.abs(np.asarray(F2) - np.asarray(F)).max() > 0
    assert np.abs(np.asarray(G2) - np.asarray(G)).max() > 0


def test_convection_gspmd_matches_single_chip():
    """The GSPMD multi-chip arm (XLA-partitioned thermal step over a 2D
    mesh) must reproduce the single-chip trajectory step for step and the
    Nusselt functional on the evolved field.  8 fixed steps instead of a
    full solve-to-steady on both paths: trajectory parity is the stronger
    per-step contract (any partitioner regression shows within a step) at
    a fraction of the single-core cost; the steady-state Nusselt numbers
    themselves are validated against de Vahl Davis single-chip above."""
    params, cfg = cv.convection_setup(1e3, n=24)
    s1 = cv.allocate_thermal(params, cfg)
    stepper = cv.ThermalGspmdStepper(params, cfg, s1)
    for _ in range(8):
        s1, _ = cv.thermal_step(s1, params, cfg, pressure_method="mg")
        stepper.step()
    s2 = stepper.state()
    assert cv.nusselt_hot_wall(s2.T, params) == pytest.approx(
        cv.nusselt_hot_wall(s1.T, params), rel=1e-3)
    np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               atol=2e-4)


def test_convection_gspmd_steady_detection():
    """The chunked steady-state detection must work UNDER a mesh: the
    per-chunk max|dT|/dt scalar comes off a sharded (padded) array, so a
    padding/fetch regression would make the criterion never (or always)
    fire.  With tol 2e-2 the n=16 Ra=1e3 transient steadies at step 240 —
    strictly before max_steps=300 — on BOTH paths, with the identical
    fetched rate."""
    from navierstokes_parallel_tpu.parallel.gspmd import _default_mesh

    params, cfg = cv.convection_setup(1e3, n=16)
    kw = dict(pressure_method="mg", steady_tol=2e-2, chunk=30,
              max_steps=300)
    s1, info1 = cv.solve_convection(params, cfg, **kw)
    s2, info2 = cv.solve_convection(params, cfg, mesh=_default_mesh(),
                                    **kw)
    assert info1["steady"] and info2["steady"]
    assert info1["steps"] == info2["steps"] < 300
    assert info2["dT_rate"] == pytest.approx(info1["dT_rate"], rel=1e-10)
    np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T),
                               atol=2e-6)


def _re(Ra, Pr=0.71):
    return float(np.sqrt(Ra / Pr))


def test_heated_obstacle_equals_narrow_cavity():
    """Exact composition check for the thermal obstacle machinery: a
    full-height isothermal strip flush against the cold wall (obstacle
    Dirichlet at t_right) must evolve identically to the narrower plain
    cavity whose right wall it impersonates — same velocity reflections,
    same temperature ghost values (2 t - T reflection on both paths),
    same masked-vs-ghost Neumann pressure operator."""
    import functools

    import jax

    from navierstokes_parallel_tpu.config import Params

    n = 32
    Re = _re(1e4)
    common = dict(problem=1, tau=0.5, omega=1.7, epsilon=1e-6,
                  max_it=20000, dtype="float64", T=1e9, Re=Re)
    cut = 3 * n // 4
    strip = Params(i_max=n, j_max=n, a=1.0, b=1.0,
                   obstacles=((cut + 1, n, 1, n),), **common)
    narrow = Params(i_max=cut, j_max=n, a=0.75, b=1.0, **common)
    alpha = 1.0 / (Re * 0.71)
    cfg_a = cv.ThermalConfig(alpha=alpha, beta_gx=0.0, beta_gy=-1.0,
                             t_left=0.5, t_right=-0.5, t_obstacle=-0.5)
    cfg_b = cv.ThermalConfig(alpha=alpha, beta_gx=0.0, beta_gy=-1.0,
                             t_left=0.5, t_right=-0.5)
    st_b = cv.allocate_thermal(narrow, cfg_b)
    st_a = cv.allocate_thermal(strip, cfg_a)
    # Embed the narrow cavity's initial conduction profile so both start
    # from the same field.
    T_a = np.full(strip.shape, -0.5)
    T_a[: cut + 1, :] = np.asarray(st_b.T)[:-1, :]
    st_a = st_a._replace(T=jnp.asarray(T_a))
    step_a = jax.jit(functools.partial(cv.thermal_step, params=strip,
                                       cfg=cfg_a,
                                       pressure_method="rb_sor"))
    step_b = jax.jit(functools.partial(cv.thermal_step, params=narrow,
                                       cfg=cfg_b,
                                       pressure_method="rb_sor"))
    a, b = st_a, st_b
    for _ in range(15):
        a, _ = step_a(a)
        b, _ = step_b(b)
    np.testing.assert_allclose(float(a.t), float(b.t), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.u)[: cut + 1, :],
                               np.asarray(b.u)[: cut + 1, :], atol=1e-8)
    np.testing.assert_allclose(np.asarray(a.v)[1 : cut + 1, :],
                               np.asarray(b.v)[1 : cut + 1, :], atol=1e-8)
    np.testing.assert_allclose(np.asarray(a.T)[1 : cut + 1, 1:-1],
                               np.asarray(b.T)[1 : cut + 1, 1:-1],
                               atol=1e-8)


def test_heated_block_flux_balance_and_boundedness():
    """Hot block in a cooled cavity (heated_block_setup) at steady state:
    the discrete heat released through the block faces balances the flux
    absorbed by the cooled side walls EXACTLY (both are the one-sided
    Dirichlet-reflection gradients of the same steady field), the fluid
    temperature stays within [t_walls, t_block], the plume rises, and the
    symmetric geometry splits the flux evenly between the two walls."""
    params, cfg = cv.heated_block_setup(Ra=1e4, n=32, block_frac=0.4,
                                        dtype="float64", epsilon=1e-6)
    state, info = cv.solve_convection(params, cfg,
                                      pressure_method="rb_sor",
                                      steady_tol=1e-7)
    T = np.asarray(state.T)
    blk = cv.block_heat_flux(state.T, params, cfg.t_obstacle)
    wall = (np.sum(2.0 * (T[1, 1:-1] - cfg.t_left)) / params.dx
            + np.sum(2.0 * (T[-2, 1:-1] - cfg.t_right)) / params.dx) \
        * params.dy
    assert blk > 1.0                                   # convecting, not dead
    np.testing.assert_allclose(wall, blk, rtol=1e-3)
    from navierstokes_parallel_tpu.ops.obstacles import fluid_mask
    fl = fluid_mask(params)
    Tf = T[fl]
    assert Tf.max() <= cfg.t_obstacle + 1e-9           # bounded by sources
    assert Tf.min() >= cfg.t_left - 1e-9
    # Plume: v > 0 in the column just above the block.
    (i0, i1, j0, j1) = params.obstacles[0]
    vcol = np.asarray(state.v)[(i0 + i1) // 2, j1 + 1 : -2]
    assert vcol.max() > 0.01
    # Left/right symmetry of the flux split.
    gl = np.sum(2.0 * (T[1, 1:-1] - cfg.t_left))
    gr = np.sum(2.0 * (T[-2, 1:-1] - cfg.t_right))
    np.testing.assert_allclose(gl, gr, rtol=1e-2)


def test_adiabatic_block_preserves_wall_balance():
    """An ADIABATIC block (t_obstacle=None) in the de Vahl Davis cavity:
    it deflects the flow but injects no heat, so the steady hot-wall and
    cold-wall Nusselt numbers must still balance; its own face flux is
    zero by construction of the mean-copy ghost."""
    params, cfg = cv.convection_setup(Ra=1e4, n=32, dtype="float64",
                                      epsilon=1e-6)
    params = params.replace(obstacles=((13, 20, 13, 20),))
    state, info = cv.solve_convection(params, cfg,
                                      pressure_method="rb_sor",
                                      steady_tol=1e-7)
    nu_h = cv.nusselt_hot_wall(state.T, params, cfg.t_left)
    nu_c = cv.nusselt_cold_wall(state.T, params, cfg.t_right)
    assert nu_h > 1.2                                  # still convecting
    np.testing.assert_allclose(nu_h, nu_c, rtol=5e-3)


# ---------------------------------------------------------------------------
# Rayleigh-Benard (heated from below)


def test_rb_conduction_fixed_point():
    """Below onset, the unperturbed RB conduction profile at rest is an
    exact fixed point (buoyancy force is x-uniform and curl-free, so the
    projection absorbs it): velocities stay at machine zero and both
    plate Nusselt numbers are exactly 1.  (The cancellation happens
    through the pressure solve — the discrete force IS a discrete
    gradient — so it is exact only to solver tolerance; epsilon=1e-10
    makes that machine level.)"""
    params, cfg = cv.rayleigh_benard_setup(1e3, n=16, dtype="float64",
                                           epsilon=1e-10)
    s = cv.allocate_thermal(params, cfg)
    T0 = np.asarray(s.T)
    for _ in range(10):
        s, _ = cv.thermal_step(s, params, cfg, pressure_method="mg")
    np.testing.assert_allclose(np.asarray(s.T), T0, atol=1e-13)
    assert float(jnp.max(jnp.abs(s.u))) < 1e-12
    assert float(jnp.max(jnp.abs(s.v))) < 1e-12
    assert cv.nusselt_bottom(s.T, params) == pytest.approx(1.0, abs=1e-10)
    assert cv.nusselt_top(s.T, params) == pytest.approx(1.0, abs=1e-10)


def test_rb_onset_growth_signs():
    """Linear stability bracketing: the single-roll mode in the critical
    free-slip box decays well below Ra_c = 1707.76 and grows well above
    it (Chandrasekhar 1961 rigid-rigid constants, cv.RB_CRITICAL_*)."""
    decay = cv.rb_growth_rate(800.0, n=24, t_transient=4.0, t_measure=8.0)
    growth = cv.rb_growth_rate(3000.0, n=24, t_transient=4.0,
                               t_measure=8.0)
    assert decay["sigma"] < -0.05
    assert growth["sigma"] > 0.05


def test_rb_critical_rayleigh_extrapolation():
    """Quantitative onset validation with NO fitted constants: measure
    the growth rate at two near-critical Ra and extrapolate sigma=0
    linearly; must land on Chandrasekhar's Ra_c = 1707.762 (measured
    1707.73 at 32x32 — 0.002%; assert 2%)."""
    r1 = cv.rb_growth_rate(1850.0, n=32, t_transient=15.0, t_measure=25.0)
    r2 = cv.rb_growth_rate(2100.0, n=32, t_transient=15.0, t_measure=25.0)
    ra_c = r1["Ra"] - r1["sigma"] * (r2["Ra"] - r1["Ra"]) / (
        r2["sigma"] - r1["sigma"])
    assert ra_c == pytest.approx(cv.RB_CRITICAL_RA, rel=0.02)


def test_rb_gspmd_matches_single_chip():
    """The UNMODIFIED RB thermal step (rotated BCs and all) must run
    multi-chip through the same GSPMD recipe: 60 fixed steps from a
    perturbed supercritical state, fields within the oracle-contract
    tolerance of single-chip."""
    from navierstokes_parallel_tpu.parallel.gspmd import _default_mesh

    params, cfg = cv.rayleigh_benard_setup(5e3, n=24)
    s0 = cv.seed_rb_perturbation(cv.allocate_thermal(params, cfg), params,
                                 cfg, amp=0.05)
    fixed = dict(pressure_method="mg", steady_tol=0.0, max_steps=60,
                 chunk=60)
    s1, _ = cv.solve_convection(params, cfg, s0, **fixed)
    s2, _ = cv.solve_convection(params, cfg, s0, mesh=_default_mesh(),
                                **fixed)
    assert float(jnp.max(jnp.abs(s1.v))) > 1e-4, "perturbation must move"
    np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2.v), np.asarray(s1.v),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Mixed convection (moving lid + buoyancy)


def test_mixed_convection_beta0_matches_isothermal_exactly():
    """Exact composition check: with buoyancy off and Pr=1 (thermal dt
    limit == viscous limit), the mixed-convection u/v trajectory must be
    BIT-identical to the isothermal cavity solver.step — same BC order,
    same adaptive dt, same projection, T a passive scalar."""
    from navierstokes_parallel_tpu import solver
    from navierstokes_parallel_tpu.grid import allocate_state

    params, cfg = cv.mixed_convection_setup(Re_lid=100.0, Gr=1e4, Pr=1.0,
                                            n=16, dtype="float64")
    cfg = cfg._replace(beta_gy=0.0, lid_u=1.0)
    ts = cv.allocate_thermal(params, cfg)
    iso = allocate_state(params)
    for _ in range(8):
        ts, _ = cv.thermal_step(ts, params, cfg, pressure_method="mg")
        iso, _ = solver.step(iso, params, pressure_method="mg")
    np.testing.assert_array_equal(np.asarray(ts.u), np.asarray(iso.u))
    np.testing.assert_array_equal(np.asarray(ts.v), np.asarray(iso.v))
    np.testing.assert_array_equal(np.asarray(ts.p), np.asarray(iso.p))
    # ...and the passive scalar was actually advected.
    T0 = np.asarray(cv.allocate_thermal(params, cfg).T)
    assert np.abs(np.asarray(ts.T) - T0).max() > 1e-6


def test_mixed_convection_stratification_confines_flow():
    """Physics of the Richardson number: at Ri >> 1 the stable
    stratification confines the lid-driven shear layer to the top of the
    cavity; at Ri << 1 the flow penetrates like the isothermal cavity.
    Compare the bottom-half share of kinetic energy."""
    import jax
    from jax import lax

    def bottom_half_share(Re_lid, Gr):
        params, cfg = cv.mixed_convection_setup(Re_lid, Gr, n=32)
        ts = cv.allocate_thermal(params, cfg)

        @jax.jit
        def chunk(ts):
            def body(ts, _):
                new, _aux = cv.thermal_step(ts, params, cfg,
                                            pressure_method="mg")
                return new, None

            ts, _ = lax.scan(body, ts, None, length=30)
            return ts

        for _ in range(16):
            ts = chunk(ts)
        u = np.asarray(ts.u)[1:-1, 1:-1] ** 2
        v = np.asarray(ts.v)[1:-1, 1:-1] ** 2
        mid = u.shape[1] // 2
        bottom = u[:, :mid].sum() + v[:, :mid].sum()
        return bottom / (u.sum() + v.sum())

    confined = bottom_half_share(Re_lid=10.0, Gr=1e4)      # Ri = 100
    penetrating = bottom_half_share(Re_lid=316.0, Gr=1e4)  # Ri ~ 0.1
    assert penetrating > 3.0 * confined, (confined, penetrating)
