"""Derived-field diagnostics units: exact discrete identities on the
staggered grid (physics-scale vortex validation lives in
scripts/validate_ghia.py, like the centerline checks)."""

import numpy as np
import pytest

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.utils import diagnostics


def _params(n=16):
    return Params(i_max=n, j_max=n, T=0.01, Re=100.0, max_it=100)


def test_stream_function_exact_discrete_antiderivative():
    """u built as the discrete y-difference of a corner psi must be
    recovered exactly (machine precision, no discretization error)."""
    prm = _params(12)
    ni, nj = prm.i_max, prm.j_max
    xc = np.arange(ni + 1) * prm.dx
    yc = np.arange(nj + 1) * prm.dy
    psi_exact = np.sin(np.pi * xc)[:, None] * (yc**2)[None, :]
    psi_exact[:, 0] = 0.0  # floor gauge, matches stream_function's

    u = np.zeros(prm.shape)
    u[: ni + 1, 1: nj + 1] = (psi_exact[:, 1:] - psi_exact[:, :-1]) / prm.dy
    psi = np.asarray(diagnostics.stream_function(u, prm))
    np.testing.assert_allclose(psi, psi_exact, atol=1e-12)


def test_vorticity_rigid_rotation():
    """Solid-body rotation u = -w(y-c), v = w(x-c) has vorticity 2w at
    every corner, exactly, for the centered staggered differences."""
    prm = _params(10)
    ni, nj = prm.i_max, prm.j_max
    w, c = 3.0, 0.5
    u = np.zeros(prm.shape)
    v = np.zeros(prm.shape)
    for j in range(prm.shape[1]):
        u[:, j] = -w * ((j - 0.5) * prm.dy - c)
    for i in range(prm.shape[0]):
        v[i, :] = w * ((i - 0.5) * prm.dx - c)
    om = np.asarray(diagnostics.vorticity(u, v, prm))
    assert om.shape == (ni + 1, nj + 1)
    np.testing.assert_allclose(om, 2.0 * w, atol=1e-12)


def test_primary_vortex_location():
    prm = _params(20)
    psi = np.zeros((prm.i_max + 1, prm.j_max + 1))
    psi[13, 7] = -0.5
    vort = diagnostics.primary_vortex(psi, prm)
    assert vort.psi == -0.5
    assert vort.x == pytest.approx(13 * prm.dx)
    assert vort.y == pytest.approx(7 * prm.dy)


def test_ghia_vortex_tables_consistent():
    assert set(diagnostics.GHIA_PSI_MIN) == set(diagnostics.GHIA_VORTEX_CENTER)
    for Re, psi in diagnostics.GHIA_PSI_MIN.items():
        assert -0.13 < psi < -0.09  # primary vortex strength band
        x, y = diagnostics.GHIA_VORTEX_CENTER[Re]
        assert 0.4 < x < 0.7 and 0.5 < y < 0.8


def test_ghia_vortex_errors_unknown_re():
    prm = _params(8)
    with pytest.raises(ValueError):
        diagnostics.ghia_vortex_errors(np.zeros(prm.shape), prm, 777)


def test_vortex_errors_zero_for_table_values():
    """A psi field whose minimum equals the Ghia value at the Ghia location
    scores ~zero error."""
    prm = _params(128)
    psi = np.zeros((prm.i_max + 1, prm.j_max + 1))
    x, y = diagnostics.GHIA_VORTEX_CENTER[1000]
    i, j = round(x / prm.dx), round(y / prm.dy)
    psi[i, j] = diagnostics.GHIA_PSI_MIN[1000]

    import navierstokes_parallel_tpu.utils.diagnostics as d

    vort = d.primary_vortex(psi, prm)
    err_psi = abs(vort.psi - d.GHIA_PSI_MIN[1000]) / abs(d.GHIA_PSI_MIN[1000])
    assert err_psi == 0.0
    assert np.hypot(vort.x - x, vort.y - y) < prm.dx


def test_monitors_uniform_flow_energy():
    """Uniform u=U, v=0: KE = 0.5 U^2 * a * b exactly (cell-centered
    averages of a constant are the constant); enstrophy (interior
    corners) and divergence are exactly zero."""
    prm = _params(12)
    U = 0.75
    u = np.full(prm.shape, U)
    v = np.zeros(prm.shape)
    m = diagnostics.physics_monitors(u, v, prm)
    assert float(m.kinetic_energy) == pytest.approx(
        0.5 * U * U * prm.a * prm.b, rel=1e-12)
    assert float(m.enstrophy) == pytest.approx(0.0, abs=1e-12)
    assert float(m.max_divergence) == pytest.approx(0.0, abs=1e-12)


def test_monitors_enstrophy_rigid_rotation():
    """Rigid rotation: omega = 2w at every corner, so the interior-corner
    enstrophy is exactly 0.5*(2w)^2 * (ni-1)(nj-1)*dx*dy."""
    prm = _params(10)
    ni, nj = prm.i_max, prm.j_max
    w, c = 3.0, 0.5
    u = np.zeros(prm.shape)
    v = np.zeros(prm.shape)
    for j in range(prm.shape[1]):
        u[:, j] = -w * ((j - 0.5) * prm.dy - c)
    for i in range(prm.shape[0]):
        v[i, :] = w * ((i - 0.5) * prm.dx - c)
    m = diagnostics.physics_monitors(u, v, prm)
    expect = 0.5 * (2 * w) ** 2 * (ni - 1) * (nj - 1) * prm.dx * prm.dy
    assert float(m.enstrophy) == pytest.approx(expect, rel=1e-12)


def test_monitors_divergence_free_construction():
    """u, v built from corner-psi differences telescope to exactly zero
    discrete divergence in every cell."""
    prm = _params(14)
    ni, nj = prm.i_max, prm.j_max
    rng = np.random.default_rng(7)
    psi = rng.standard_normal((ni + 1, nj + 1))
    u = np.zeros(prm.shape)
    v = np.zeros(prm.shape)
    u[: ni + 1, 1: nj + 1] = (psi[:, 1:] - psi[:, :-1]) / prm.dy
    v[1: ni + 1, : nj + 1] = -(psi[1:, :] - psi[:-1, :]) / prm.dx
    m = diagnostics.physics_monitors(u, v, prm)
    assert float(m.max_divergence) < 1e-10
    # psi_min matches the direct stream-function minimum
    psi_rec = np.asarray(diagnostics.stream_function(u, prm))
    assert float(m.psi_min) == pytest.approx(float(psi_rec.min()), abs=1e-12)
