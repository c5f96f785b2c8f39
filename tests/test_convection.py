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
    for _ in range(20):
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
    mesh) must reproduce the single-chip steady state and Nusselt
    number."""
    from navierstokes_parallel_tpu.parallel.gspmd import _default_mesh

    params, cfg = cv.convection_setup(1e3, n=24)
    s1, info1 = cv.solve_convection(params, cfg, pressure_method="mg",
                                    steady_tol=1e-5)
    mesh = _default_mesh()
    s2, info2 = cv.solve_convection(params, cfg, pressure_method="mg",
                                    steady_tol=1e-5, mesh=mesh)
    assert info2["steady"] and info1["steady"]
    assert cv.nusselt_hot_wall(s2.T, params) == pytest.approx(
        cv.nusselt_hot_wall(s1.T, params), rel=1e-3)
    np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               atol=2e-4)
