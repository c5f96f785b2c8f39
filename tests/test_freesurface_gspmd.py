"""Free-surface flows multi-chip (GSPMD recipe) — round-4 verdict item 9.

The grid fields shard over a 2D device mesh exactly like the isothermal
GSPMD backend (parallel/gspmd.py: boundary-padded at the jit boundary,
XLA partitioner inserts the collectives); the marker particles stay
replicated.  The contract is the repo-wide oracle tolerance (1e-4), but
on the CPU mesh the partitioned program is expected to match the
single-chip one far tighter — the asserts below use 1e-10.
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from navierstokes_parallel_tpu.grid import allocate_state
from navierstokes_parallel_tpu.models import freesurface as FS
from navierstokes_parallel_tpu.parallel.topology import MESH_AXES


def _mesh(px, py):
    devs = jax.devices()
    if len(devs) < px * py:
        pytest.skip(f"needs {px * py} devices")
    return Mesh(np.asarray(devs[: px * py]).reshape(px, py), MESH_AXES)


def _assert_fs_close(a, b, tol=1e-10):
    for name in ("u", "v", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(a.state, name)),
            np.asarray(getattr(b.state, name)), atol=tol, err_msg=name)
    np.testing.assert_allclose(np.asarray(a.pset.x), np.asarray(b.pset.x),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(a.pset.y), np.asarray(b.pset.y),
                               atol=tol)
    np.testing.assert_array_equal(np.asarray(a.pset.active),
                                  np.asarray(b.pset.active))


def test_gspmd_dam_break_matches_single_chip():
    """Whole dam-break solve on a 2x4 mesh == the single-chip while_loop
    (the verdict item's done-criterion).  The 16/unit grid (82x50 padded
    to the mesh) exercises non-divisible padding on both axes."""
    params, fs = FS.dam_break(n=16, T=0.2, width=1.0, height=2.0)
    ref, ref_stats = FS.solve_free(params, fs)
    out, stats = FS.solve_free(params, fs, mesh=_mesh(2, 4))
    assert int(stats.steps) == int(ref_stats.steps)
    assert int(stats.sor_failures) == int(ref_stats.sor_failures)
    _assert_fs_close(out, ref)
    np.testing.assert_allclose(FS.fluid_volume(out, params),
                               FS.fluid_volume(ref, params), rtol=1e-12)


def test_gspmd_step_fn_matches_single_chip():
    """Host-driven stepping twin (make_free_step_gspmd) over a sloshing
    wave — free-slip walls + the SUMMAC interpolated surface condition on
    the mesh."""
    params, fs = FS.sloshing(n=16, T=1.0)
    mesh = _mesh(2, 2)
    step1 = FS.make_free_step_fn(params, "freeslip")
    stepN = FS.make_free_step_gspmd(params, mesh, wall="freeslip")
    ref, sh = fs, FS.place_free(fs, params, mesh)
    for _ in range(3):
        ref, d1 = step1(ref)
        sh, dN = stepN(sh)
        np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-12)
        assert int(dN.sor_iterations) == int(d1.sor_iterations)
    _assert_fs_close(FS.fetch_free(sh, params), ref)


def test_gspmd_obstacle_composition():
    """Obstacle domains compose with free surfaces on the mesh: the
    half-blocked wide dam break equals its narrow twin on the common
    cells (the single-chip equivalence of test_freesurface.py, run
    multi-chip on the wide domain)."""
    n = 8
    pw, _ = FS.dam_break(n=n, a=5.0, b=3.0)
    pw = dataclasses.replace(pw, obstacles=((4 * n + 1, 5 * n, 1, 3 * n),))
    fw = FS.FreeSurfaceState(
        state=allocate_state(pw),
        pset=FS.fill_region(pw, 0.0, 1.0, 0.0, 2.0))
    pn, fn = FS.dam_break(n=n, a=4.0, b=3.0)
    mesh = _mesh(2, 2)
    step_w = FS.make_free_step_gspmd(pw, mesh)
    step_n = FS.make_free_step_fn(pn, "noslip")
    sw = FS.place_free(fw, pw, mesh)
    for _ in range(5):
        sw, _ = step_w(sw)
        fn, _ = step_n(fn)
    fw = FS.fetch_free(sw, pw)
    ue = 4 * n + 1
    np.testing.assert_allclose(np.asarray(fw.state.u)[:ue, :],
                               np.asarray(fn.state.u)[:ue, :], atol=1e-10)
    np.testing.assert_allclose(np.asarray(fw.state.p)[1:ue, :],
                               np.asarray(fn.state.p)[1:ue, :], atol=1e-9)


def test_gspmd_rejects_1d_mesh():
    """The XLA trivial-axis partitioner miscompile guard
    (parallel/gspmd.py::_check_mesh) covers the free-surface path too."""
    params, fs = FS.dam_break(n=8, T=0.1)
    with pytest.raises(ValueError, match="mesh"):
        FS.solve_free(params, fs, mesh=_mesh(1, 8))
