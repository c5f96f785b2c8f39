"""Numerical-guard tests (utils/checks.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.grid import State, allocate_state
from navierstokes_parallel_tpu.utils import checks


def test_validate_state_passes_clean():
    prm = Params(i_max=8, j_max=8)
    checks.validate_state(allocate_state(prm))


def test_validate_state_catches_nan():
    prm = Params(i_max=8, j_max=8)
    s = allocate_state(prm)
    bad = s.u.at[3, 3].set(jnp.nan)
    with pytest.raises(checks.NonFiniteStateError, match="non-finite"):
        checks.validate_state(State(bad, s.v, s.p, s.t, s.n), where="test")


def test_validate_state_catches_inf():
    prm = Params(i_max=8, j_max=8)
    s = allocate_state(prm)
    bad = s.p.at[1, 1].set(jnp.inf)
    with pytest.raises(checks.NonFiniteStateError):
        checks.validate_state(State(s.u, s.v, bad, s.t, s.n))


def test_cfl_report():
    prm = Params(i_max=16, j_max=16, Re=100.0)
    s = allocate_state(prm)
    u = s.u.at[5, 5].set(2.0)
    rep = checks.cfl_report(u, s.v, prm)
    assert rep["u_max"] == 2.0
    assert rep["dt_convective_x"] == pytest.approx(prm.dx / 2.0)
    assert rep["dt_viscous_limit"] > 0

def test_cli_debug_nans_flag(tmp_path, capsys):
    """--debug-nans parses and a stable run passes the end-of-run guard."""
    from navierstokes_parallel_tpu import cli
    import jax
    cfg = tmp_path / "ok.in"
    Params(i_max=8, j_max=8, T=0.05, Re=100.0, tau=0.5,
           epsilon=1e-4, max_it=100, n_print=1).to_file(str(cfg))
    rc = cli.main([str(cfg), "--debug-nans"])
    assert rc == 0
    assert jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", False)
    out = capsys.readouterr().out
    assert "U-CENTER" in out


def test_profiler_trace_smoke(tmp_path):
    from navierstokes_parallel_tpu.utils.timing import profiler_trace
    import jax.numpy as jnp

    with profiler_trace(str(tmp_path / "trace")) as d:
        _ = (jnp.ones((64, 64)) * 2).sum().block_until_ready()
    import os
    assert os.path.isdir(d)
