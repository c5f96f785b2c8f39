"""Plotting/animation ports (reference plot_ghia/plot_field/plot_pressure)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.utils import io as nsio
from navierstokes_parallel_tpu.utils import plotting


def _write_frames(tmp_path, n_frames=3, n=8):
    rng = np.random.default_rng(0)
    shape = (n + 2, n + 2)
    for k in range(n_frames):
        u = rng.standard_normal(shape) * 0.1
        v = rng.standard_normal(shape) * 0.1
        p = rng.standard_normal(shape)
        nsio.output(u, v, p, t=0.1 * k, a=1.0, b=1.0,
                    prefix=str(tmp_path / str(k)), verbose=False)


def test_ghia_plot(tmp_path):
    prm = Params(i_max=16, j_max=16)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(prm.shape) * 0.1
    v = rng.standard_normal(prm.shape) * 0.1
    pu, pv = plotting.plot_ghia(u, v, prm, 100, str(tmp_path / "g"))
    import os
    assert os.path.getsize(pu) > 1000 and os.path.getsize(pv) > 1000


def test_flow_animation(tmp_path):
    _write_frames(tmp_path)
    gif = plotting.animate_flow(str(tmp_path), str(tmp_path / "f.gif"), fps=2)
    import os
    assert os.path.getsize(gif) > 1000


def test_pressure_animation(tmp_path):
    _write_frames(tmp_path)
    gif = plotting.animate_pressure(str(tmp_path), str(tmp_path / "p.gif"),
                                    fps=2)
    import os
    assert os.path.getsize(gif) > 1000


def test_animation_requires_frames(tmp_path):
    with pytest.raises(FileNotFoundError):
        plotting.animate_flow(str(tmp_path / "empty"))


def test_streamline_plot(tmp_path):
    prm = Params(i_max=16, j_max=16)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(prm.shape) * 0.1
    path = plotting.plot_streamlines(u, prm, str(tmp_path / "psi.png"),
                                     Re=1000)
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_history_plot(tmp_path):
    hist = tmp_path / "hist.csv"
    hist.write_text(
        "step,t,dt,sor_iterations,res_norm,kinetic_energy,enstrophy,"
        "max_divergence,psi_min\n"
        + "".join(f"{i},{i*0.01},0.01,{100+i},{1e-3/(i+1)},{0.1*i},"
                  f"{0.5*i},{1e-5},{-0.01*i}\n" for i in range(1, 6)))
    path = plotting.plot_history(str(hist), str(tmp_path / "h.png"))
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_history_plot_solver_columns_only(tmp_path):
    hist = tmp_path / "hist.csv"
    hist.write_text("step,t,dt,sor_iterations,res_norm\n"
                    "1,0.01,0.01,120,1.5e-4\n2,0.02,0.01,118,9.0e-5\n")
    path = plotting.plot_history(str(hist), str(tmp_path / "h2.png"))
    import os

    assert os.path.getsize(path) > 0


def test_history_plot_empty_raises(tmp_path):
    hist = tmp_path / "hist.csv"
    hist.write_text("step,t,dt,sor_iterations,res_norm\n")
    with pytest.raises(ValueError, match="no data rows"):
        plotting.plot_history(str(hist), str(tmp_path / "h3.png"))


def test_channel_plot(tmp_path):
    import os

    prm = Params(problem=3, i_max=16, j_max=8, a=2.0, b=1.0)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(prm.shape) * 0.1
    p = plotting.plot_channel(u, prm, str(tmp_path / "c.png"))
    assert os.path.getsize(p) > 1000


def test_obstacle_flow_plot(tmp_path):
    import os

    prm = Params(problem=3, i_max=16, j_max=8, a=2.0, b=1.0,
                 obstacles=((1, 4, 1, 4),))
    rng = np.random.default_rng(3)
    u = rng.standard_normal(prm.shape) * 0.1
    v = rng.standard_normal(prm.shape) * 0.1
    p = plotting.plot_obstacle_flow(u, v, prm, str(tmp_path / "o.png"))
    assert os.path.getsize(p) > 1000
