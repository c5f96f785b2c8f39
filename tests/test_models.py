"""Model-family and Ghia-validation-machinery tests."""

import numpy as np
import pytest

from navierstokes_parallel_tpu.models import cavity
from navierstokes_parallel_tpu.config import Params


def test_factories():
    p = cavity.lid_driven_cavity(Re=400.0, n=64, T=2.0)
    assert p.problem == 1 and p.Re == 400.0 and p.i_max == 64
    q = cavity.oscillating_lid(f=5.0, n=32)
    assert q.problem == 2 and q.f == 5.0


def test_ghia_tables_shape():
    for Re in (100, 400, 1000, 10000):
        assert cavity.GHIA_U[Re].shape == cavity.GHIA_Y.shape
        assert cavity.GHIA_V[Re].shape == cavity.GHIA_X.shape
        # lid-driven endpoints: u=1 at the lid, 0 at the floor; v=0 at walls
        assert cavity.GHIA_U[Re][0] == 1.0 and cavity.GHIA_U[Re][-1] == 0.0
        assert cavity.GHIA_V[Re][0] == 0.0 and cavity.GHIA_V[Re][-1] == 0.0


def test_centerline_extraction():
    prm = Params(i_max=8, j_max=8)
    shape = prm.shape
    u = np.zeros(shape)
    v = np.zeros(shape)
    # u varies only with y: u = y at sample points y=(j-0.5)*dy
    dy = prm.dy
    for j in range(shape[1]):
        u[:, j] = (j - 0.5) * dy
    y, u_prof, x, v_prof = cavity.centerline_profiles(u, v, prm)
    np.testing.assert_allclose(u_prof, y, rtol=1e-12)
    assert y[0] == pytest.approx(0.5 * dy)
    assert y[-1] == pytest.approx(1.0 - 0.5 * dy)


def test_ghia_errors_selfconsistent():
    """Profiles synthesized by interpolating the Ghia table itself must
    score ~zero error."""
    prm = Params(i_max=512, j_max=512)
    shape = prm.shape
    u = np.zeros(shape)
    v = np.zeros(shape)
    dy, dx = prm.dy, prm.dx
    ys = (np.arange(shape[1]) - 0.5) * dy
    # np.interp needs ascending x: Ghia tables are descending
    u_interp = np.interp(ys, cavity.GHIA_Y[::-1], cavity.GHIA_U[100][::-1])
    for j in range(shape[1]):
        u[:, j] = u_interp[j]
    xs = (np.arange(shape[0]) - 0.5) * dx
    v_interp = np.interp(xs, cavity.GHIA_X[::-1], cavity.GHIA_V[100][::-1])
    for i in range(shape[0]):
        v[i, :] = v_interp[i]
    errs = cavity.ghia_errors(u, v, prm, 100)
    # Double piecewise-linear interpolation on the nonuniform table leaves
    # O(h * slope-change) error; at 512^2 any indexing/orientation bug would
    # show up as O(0.1).
    assert errs.max_u_err < 2e-3
    assert errs.max_v_err < 2e-3


def test_ghia_errors_unknown_re():
    prm = Params(i_max=8, j_max=8)
    with pytest.raises(ValueError):
        cavity.ghia_errors(np.zeros(prm.shape), np.zeros(prm.shape), prm, 777)
