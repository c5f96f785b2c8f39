"""Problem 5 — natural convection through the reference protocol surface.

Round-4 capability (round-3 verdict item 8): the Boussinesq family
(models/convection.py, validated against de Vahl Davis in
test_convection.py) is reachable from the CLI / ``.in`` contract like
every other family: problem type 5 with optional extra parameter lines
16 (Ra) / 17 (Pr), temperature frames, checkpoint/resume carrying T.
"""

import os

import numpy as np
import pytest

from navierstokes_parallel_tpu import cli
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.models import convection as conv
from navierstokes_parallel_tpu.utils.io import read_field


def _write_config(path, extra=(), **kw):
    defaults = dict(problem=5, i_max=12, j_max=12, T=0.2, Ra=1000.0,
                    Pr=0.71, tau=0.5, epsilon=1e-5, max_it=2000, n_print=1)
    defaults.update(kw)
    Params(**defaults).to_file(str(path))


# ---------------------------------------------------------------------------
# Config surface
# ---------------------------------------------------------------------------


def test_params_problem5_roundtrip(tmp_path):
    p = Params(problem=5, Ra=10000.0, Pr=0.71)
    # Ra authoritative: Re derived in the convective scale.
    assert p.Re == pytest.approx(float(np.sqrt(10000.0 / 0.71)))
    path = tmp_path / "c.in"
    p.to_file(str(path))
    txt = path.read_text()
    assert txt.count("\n") == 17          # 15 reference lines + Ra + Pr
    p2 = Params.from_file(str(path))
    assert (p2.Ra, p2.Pr, p2.Re) == (p.Ra, p.Pr, p.Re)


def test_params_problem5_ra_derived_from_re():
    p = Params(problem=5, Re=100.0, Pr=0.5, Ra=0.0)
    assert p.Ra == pytest.approx(100.0 * 100.0 * 0.5)


def test_params_problem5_fifteen_line_file(tmp_path):
    # The bare 15-line reference format stays valid for problem 5 (Ra
    # derived from the Re line).
    path = tmp_path / "c.in"
    iso = Params(problem=1, Re=100.0)
    lines = iso.to_text().splitlines()
    lines[0] = "5"
    path.write_text("\n".join(lines) + "\n")
    p = Params.from_file(str(path))
    assert p.problem == 5
    assert p.Ra == pytest.approx(100.0 * 100.0 * 0.71)


def test_params_problem5_validation():
    with pytest.raises(ValueError, match="Pr"):
        Params(problem=5, Pr=0.0)
    with pytest.raises(ValueError, match="Ra"):
        Params(problem=5, Ra=-1.0)
    with pytest.raises(ValueError, match="problem"):
        Params(problem=7)  # 6 = free surface is valid now
    with pytest.raises(ValueError, match="problem=5"):
        conv.config_from_params(Params(problem=1))


# ---------------------------------------------------------------------------
# thermal_solve (the fixed-horizon driver behind the CLI)
# ---------------------------------------------------------------------------


def test_thermal_solve_matches_stepwise():
    params = Params(problem=5, i_max=12, j_max=12, T=0.15, Ra=1000.0,
                    Pr=0.71, tau=0.5, epsilon=1e-5, max_it=2000,
                    dtype="float32")
    cfg = conv.config_from_params(params)
    ts, stats = conv.thermal_solve(params, cfg, pressure_method="mg")
    assert int(stats.sor_failures) == 0
    assert float(ts.t) >= params.T
    # Host-stepped twin (the CLI host-loop path) must match bitwise: same
    # jitted step, same order.
    fn = conv.make_thermal_step_fn(params, cfg, "mg")
    tw = conv.allocate_thermal(params, cfg)
    steps = 0
    while float(tw.t) < params.T:
        tw, diag = fn(tw)
        steps += 1
    assert steps == int(stats.steps)
    np.testing.assert_array_equal(np.asarray(ts.u), np.asarray(tw.u))
    np.testing.assert_array_equal(np.asarray(ts.T), np.asarray(tw.T))


# ---------------------------------------------------------------------------
# CLI end to end
# ---------------------------------------------------------------------------


def test_cli_problem5_protocol_and_temperature_frames(tmp_path, capsys):
    cfg = tmp_path / "c.in"
    _write_config(cfg, T=0.1)
    outdir = tmp_path / "frames"
    rc = cli.main([str(cfg), "--stats", "--output-dir", str(outdir),
                   "--final-output-prefix", str(tmp_path / "final")])
    assert rc == 0
    out = capsys.readouterr()
    lines = out.out.strip().splitlines()
    assert lines[0].startswith("U-CENTER: ")
    assert lines[1].startswith("V-CENTER: ")
    float(out.err.strip().splitlines()[-1])
    # Temperature frames next to u/v/p, same grid text format.
    names = sorted(os.listdir(outdir))
    assert any(n.endswith("_temp.txt") for n in names)
    t, a, b, T0 = read_field(str(outdir / "0_temp.txt"))
    assert T0.shape == (14, 14)
    # Frame 0 is the initial condition: the conduction profile between
    # the hot (+1/2) and cold (-1/2) walls.
    assert T0[1, 1:-1].mean() > 0.4
    assert T0[-2, 1:-1].mean() < -0.4
    tf, _, _, Tf = read_field(str(tmp_path) + "/final_temp.txt")
    assert tf >= 0.1
    assert np.all(np.isfinite(Tf))


def test_cli_problem5_checkpoint_resume(tmp_path, capsys):
    cfg = tmp_path / "c.in"
    _write_config(cfg, T=1.0)
    ck = tmp_path / "ck.npz"
    rc = cli.main([str(cfg), "--checkpoint-every", "3",
                   "--checkpoint-path", str(ck), "--max-steps", "6"])
    assert rc == 3  # incomplete
    capsys.readouterr()
    with np.load(ck) as data:
        assert "T" in data  # thermal checkpoints carry the temperature
        n0 = int(data["n"])
    assert n0 == 6
    rc = cli.main([str(cfg), "--resume", str(ck), "--max-steps", "4",
                   "--checkpoint-every", "2", "--checkpoint-path", str(ck)])
    assert rc == 3
    capsys.readouterr()
    with np.load(ck) as data:
        assert int(data["n"]) == 10  # absolute step numbering continues


def test_cli_problem5_rejects_isothermal_checkpoint(tmp_path, capsys):
    iso_cfg = tmp_path / "iso.in"
    from navierstokes_parallel_tpu.grid import allocate_state
    from navierstokes_parallel_tpu.utils.checkpoint import save_checkpoint

    params = Params(problem=5, i_max=12, j_max=12)
    save_checkpoint(str(tmp_path / "iso.npz"), allocate_state(params))
    _write_config(iso_cfg)
    rc = cli.main([str(iso_cfg), "--resume", str(tmp_path / "iso.npz")])
    assert rc == 1
    assert "temperature" in capsys.readouterr().err


def test_cli_problem5_rejects_mesh_on_single_chip(tmp_path, capsys):
    cfg = tmp_path / "c.in"
    _write_config(cfg)
    # --mesh needs a multi-chip backend
    rc = cli.main([str(cfg), "--mesh", "2x2"])
    assert rc == 1
    assert "--mesh" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# Multi-chip (GSPMD recipe): thermal_solve(mesh=...) and the CLI backend
# ---------------------------------------------------------------------------


def _mesh(px, py):
    import jax
    from jax.sharding import Mesh

    from navierstokes_parallel_tpu.parallel.topology import MESH_AXES

    devs = jax.devices()
    if len(devs) < px * py:
        pytest.skip(f"needs {px * py} devices")
    return Mesh(np.asarray(devs[: px * py]).reshape(px, py), MESH_AXES)


def test_thermal_solve_gspmd_matches_single_chip():
    params = Params(problem=5, i_max=18, j_max=18, T=0.3, Ra=5000.0,
                    Pr=0.71, tau=0.5, epsilon=1e-6, max_it=5000)
    cfg = conv.config_from_params(params)
    ts0 = conv.allocate_thermal(params, cfg)
    single, st1 = conv.thermal_solve(params, cfg, ts0, pressure_method="mg")
    multi, st2 = conv.thermal_solve(params, cfg, ts0, pressure_method="mg",
                                    mesh=_mesh(2, 4))
    assert int(st1.steps) == int(st2.steps)
    for name in ("u", "v", "p", "T"):
        np.testing.assert_allclose(
            np.asarray(getattr(single, name)),
            np.asarray(getattr(multi, name)), atol=1e-4, err_msg=name)


def test_cli_problem5_gspmd_backend(tmp_path, capsys):
    cfg = tmp_path / "c.in"
    _write_config(cfg, T=0.1)
    if len(__import__("jax").devices()) < 4:
        pytest.skip("needs 4 devices")
    rc = cli.main([str(cfg), "--stats"])
    assert rc == 0
    single = capsys.readouterr()
    outdir = tmp_path / "frames"
    rc = cli.main([str(cfg), "--backend", "gspmd", "--mesh", "2x2",
                   "--stats", "--output-dir", str(outdir)])
    assert rc == 0
    multi = capsys.readouterr()
    # Same protocol lines, matching centers to the oracle tolerance.
    u1 = float(single.out.splitlines()[0].split()[-1])
    u2 = float(multi.out.splitlines()[0].split()[-1])
    assert u2 == pytest.approx(u1, abs=1e-4)
    # Temperature frames come out of the sharded host loop too.
    assert any(n.endswith("_temp.txt") for n in os.listdir(outdir))
