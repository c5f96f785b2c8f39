"""Free surfaces on the manual shard_map backend
(parallel/sharded_free.py — round-4 verdict stretch item 10, completing
the every-family-on-both-backends matrix).

Design under test: replicated master + shard_mapped windowed correction
sweeps with psum assembly.  The sweeps are EXACTLY the single-chip
masked red-black sweeps (same order, same masks), so parity on the CPU
mesh is asserted at 1e-9 — far inside the repo-wide 1e-4 contract — and
the refinement-outer iteration counts must match EXACTLY (the twin runs
the same outer program).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from navierstokes_parallel_tpu import cli
from navierstokes_parallel_tpu.models import freesurface as FS
from navierstokes_parallel_tpu.parallel import sharded_free as SF
from navierstokes_parallel_tpu.parallel.topology import MESH_AXES


def _mesh(px, py):
    devs = jax.devices()
    if len(devs) < px * py:
        pytest.skip(f"needs {px * py} devices")
    return Mesh(np.asarray(devs[: px * py]).reshape(px, py), MESH_AXES)


def _assert_fs_close(a, b, tol=1e-9):
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


def test_sharded_free_dam_break_matches_single_chip():
    """Whole dam-break solve: fields, particles, step AND sweep counts.
    75x45 interior on the 2x4 mesh is GENUINELY ragged on both axes
    (li=38 -> 76 > 75, lj=12 -> 48 > 45): this pins the pad-to-divisible
    window fix — lax.dynamic_slice clamping used to shift the last
    shard's core on exactly these shapes."""
    params, fs = FS.dam_break(n=15, T=0.25, width=1.0, height=2.0)
    ref, st1 = FS.solve_free(params, fs)
    out, st2 = SF.solve_free_sharded(params, fs, _mesh(2, 4))
    assert int(st2.steps) == int(st1.steps)
    assert int(st2.total_sor_iterations) == int(st1.total_sor_iterations)
    assert int(st2.sor_failures) == int(st1.sor_failures)
    _assert_fs_close(out, ref)
    np.testing.assert_allclose(FS.fluid_volume(out, params),
                               FS.fluid_volume(ref, params), rtol=1e-12)


def test_sharded_free_sloshing_stepper():
    """Host-driven stepping twin over the sloshing wave (free-slip walls
    + SUMMAC interpolated surface condition through the hook)."""
    params, fs = FS.sloshing(n=16, T=1.0)
    mesh = _mesh(2, 2)
    step1 = FS.make_free_step_fn(params, "freeslip")
    stepN = SF.make_free_step_sharded(params, mesh, wall="freeslip")
    ref = sh = fs
    for _ in range(3):
        ref, d1 = step1(ref)
        sh, dN = stepN(sh)
        np.testing.assert_allclose(float(dN.dt), float(d1.dt), rtol=1e-12)
        assert int(dN.sor_iterations) == int(d1.sor_iterations)
    _assert_fs_close(sh, ref)


def test_sharded_free_obstacle_composition():
    """Obstacle domains compose: the half-blocked wide dam break equals
    its narrow twin on the common cells (the single-chip equivalence of
    test_freesurface.py, run with sharded sweeps on the wide domain)."""
    from navierstokes_parallel_tpu.grid import allocate_state

    n = 8
    pw, _ = FS.dam_break(n=n, a=5.0, b=3.0)
    pw = pw.replace(obstacles=((4 * n + 1, 5 * n, 1, 3 * n),), T=0.4)
    fsw = FS.FreeSurfaceState(state=allocate_state(pw),
                              pset=FS.fill_region(pw, 0.0, 1.0, 0.0, 2.0))
    pn, _ = FS.dam_break(n=n, a=4.0, b=3.0)
    pn = pn.replace(T=0.4)
    fsn = FS.FreeSurfaceState(state=allocate_state(pn),
                              pset=FS.fill_region(pn, 0.0, 1.0, 0.0, 2.0))
    outw, _ = SF.solve_free_sharded(pw, fsw, _mesh(2, 4))
    outn, stn = FS.solve_free(pn, fsn)
    uw = np.asarray(outw.state.u)[: 4 * n + 1, :]
    un = np.asarray(outn.state.u)[: 4 * n + 1, :]
    np.testing.assert_allclose(uw, un, atol=1e-9)


def test_cli_problem6_sharded_backend(tmp_path, capsys):
    """--backend sharded through the reference protocol surface equals
    the single-chip run (whole-solve path)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import shutil

    cfg = tmp_path / "d.in"
    shutil.copy("configs/dambreak.in", cfg)
    # Shrink the run: rewrite T (line 7) for test speed.
    lines = cfg.read_text().splitlines()
    lines[6] = "0.15"
    cfg.write_text("\n".join(lines) + "\n")
    assert cli.main([str(cfg), "--free-wall", "freeslip"]) == 0
    single = capsys.readouterr().out
    assert cli.main([str(cfg), "--free-wall", "freeslip",
                     "--backend", "sharded", "--mesh", "2x4"]) == 0
    multi = capsys.readouterr().out
    u1 = float(single.splitlines()[0].split()[-1])
    u2 = float(multi.splitlines()[0].split()[-1])
    assert u2 == pytest.approx(u1, abs=1e-6)
