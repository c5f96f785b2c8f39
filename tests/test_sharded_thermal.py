"""Thermal convection on the manual shard_map backend
(parallel/sharded_thermal.py) — the deep-halo/sharded-mg/pencil-fft path
carries the energy equation.

The contract is exact-twin parity with the single-chip
convection.thermal_step integration (same math, same program order) to
the repo-wide 1e-4 oracle tolerance; on the CPU mesh the partitioned
program matches far tighter (~1e-8 observed, f32 state).
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from navierstokes_parallel_tpu import cli
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.models import convection as conv
from navierstokes_parallel_tpu.parallel import sharded_thermal as sht
from navierstokes_parallel_tpu.parallel.topology import MESH_AXES


def _mesh(px, py):
    devs = jax.devices()
    if len(devs) < px * py:
        pytest.skip(f"needs {px * py} devices")
    return Mesh(np.asarray(devs[: px * py]).reshape(px, py), MESH_AXES)


def _params(**kw):
    defaults = dict(problem=5, i_max=16, j_max=16, T=0.3, Ra=5000.0,
                    Pr=0.71, tau=0.5, epsilon=1e-6, max_it=5000)
    defaults.update(kw)
    return Params(**defaults)


def _assert_parity(single, multi, tol=1e-4):
    for name in ("u", "v", "p", "T"):
        np.testing.assert_allclose(
            np.asarray(getattr(single, name)),
            np.asarray(getattr(multi, name)), atol=tol, err_msg=name)


@pytest.mark.parametrize("method", ["rb_sor", "mg", "fft"])
def test_sharded_thermal_matches_single_chip(method):
    """De Vahl Davis cavity: every sharded pressure method under thermal
    coupling reproduces the single-chip integration (incl. the ghost
    ring — output-file parity)."""
    params = _params()
    cfg = conv.config_from_params(params)
    ts0 = conv.allocate_thermal(params, cfg)
    single, st1 = conv.thermal_solve(params, cfg, ts0,
                                     pressure_method=method)
    multi, st2 = sht.solve_sharded_thermal(params, cfg, ts0, _mesh(2, 4),
                                           pressure_method=method)
    assert int(st1.steps) == int(st2.steps)
    assert int(st2.sor_failures) == 0
    _assert_parity(single, multi)


def test_sharded_thermal_rayleigh_benard_freeslip():
    """Heated-from-below + free-slip sidewalls (the RB family's rotated
    BCs and the mixed velocity BC twin) on the mesh."""
    params, cfg = conv.rayleigh_benard_setup(Ra=3000.0, n=16,
                                             sidewalls="freeslip",
                                             aspect=1.0)
    params = params.replace(T=0.5)
    ts0 = conv.seed_rb_perturbation(
        conv.allocate_thermal(params, cfg), params, cfg, amp=1e-3)
    single, st1 = conv.thermal_solve(params, cfg, ts0,
                                     pressure_method="rb_sor")
    multi, st2 = sht.solve_sharded_thermal(params, cfg, ts0, _mesh(2, 4),
                                           pressure_method="rb_sor")
    assert int(st1.steps) == int(st2.steps)
    _assert_parity(single, multi)


def test_sharded_thermal_padded_grid_and_stepper():
    """Pad-to-divisible sharding (17x14 on a 2x4 mesh pads both axes) and
    the host-loop stepper twin (bitwise vs the whole-solve program)."""
    params = _params(i_max=17, j_max=14, T=0.12, Ra=4000.0)
    cfg = conv.config_from_params(params)
    ts0 = conv.allocate_thermal(params, cfg)
    mesh = _mesh(2, 4)
    single, st1 = conv.thermal_solve(params, cfg, ts0,
                                     pressure_method="rb_sor")
    multi, st2 = sht.solve_sharded_thermal(params, cfg, ts0, mesh,
                                           pressure_method="rb_sor")
    assert int(st1.steps) == int(st2.steps)
    _assert_parity(single, multi)

    stepper = sht.ThermalShardedStepper(params, cfg, ts0, mesh=mesh,
                                        pressure_method="rb_sor")
    stepper.warm()
    for _ in range(int(st1.steps)):
        stepper.step()
    stw = stepper.state()
    for name in ("u", "v", "p", "T"):
        np.testing.assert_array_equal(np.asarray(getattr(stw, name)),
                                      np.asarray(getattr(multi, name)),
                                      err_msg=name)


def test_sharded_thermal_validation():
    params = _params(obstacles=((6, 10, 6, 10),))
    cfg = conv.config_from_params(params)
    with pytest.raises(ValueError, match="obstacle"):
        sht.solve_sharded_thermal(params, cfg, mesh=_mesh(2, 4))
    with pytest.raises(ValueError, match="sidewall"):
        sht.solve_sharded_thermal(
            _params(), conv.config_from_params(_params())._replace(
                sidewalls="periodic"), mesh=_mesh(2, 4))


def test_cli_problem5_sharded_backend(tmp_path, capsys):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = tmp_path / "c.in"
    p = _params(i_max=12, j_max=12, T=0.1, Ra=1000.0, epsilon=1e-5,
                max_it=2000, n_print=1)
    p.to_file(str(cfg))
    rc = cli.main([str(cfg), "--stats"])
    assert rc == 0
    single = capsys.readouterr()
    outdir = tmp_path / "frames"
    rc = cli.main([str(cfg), "--backend", "sharded", "--mesh", "2x4",
                   "--stats", "--output-dir", str(outdir)])
    assert rc == 0
    multi = capsys.readouterr()
    u1 = float(single.out.splitlines()[0].split()[-1])
    u2 = float(multi.out.splitlines()[0].split()[-1])
    assert u2 == pytest.approx(u1, abs=1e-4)
    assert any(n.endswith("_temp.txt") for n in os.listdir(outdir))


def test_sharded_thermal_gamma_fixed_parity():
    """gamma_fixed must reach all thermal steppers identically: the primal
    thermal_step ignoring it while its twins honored it silently broke the
    1e-4 twin-parity contract (round-4 ADVICE finding — the parity gates
    only covered gamma_fixed=None)."""
    from navierstokes_parallel_tpu import diff

    params = _params(T=0.08, gamma_fixed=0.4)
    cfg = conv.config_from_params(params)
    ts0 = conv.allocate_thermal(params, cfg)
    single, st1 = conv.thermal_solve(params, cfg, ts0,
                                     pressure_method="rb_sor")
    multi, _ = sht.solve_sharded_thermal(params, cfg, ts0, _mesh(2, 4),
                                         pressure_method="rb_sor")
    _assert_parity(single, multi)
    # The differentiable twin integrates the same fixed-gamma operator.
    dts = ts0
    for _ in range(int(st1.steps)):
        dts, _ = diff.diff_thermal_step(dts, params, cfg,
                                        pressure_method="rb_sor")
    _assert_parity(single, dts)
