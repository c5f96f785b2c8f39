"""GSPMD auto-sharded backend (parallel/gspmd.py): every jnp pressure
method must run over an 8-device mesh and match the single-chip solver
within the reference tolerance contract (the notebook comparator's 1e-4;
SURVEY.md §3.5) — most differences here are pure reduction-order noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import assert_close_reference_contract
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.grid import allocate_state
from navierstokes_parallel_tpu.parallel import gspmd
from navierstokes_parallel_tpu.parallel.topology import MESH_AXES, make_grid_mesh
from navierstokes_parallel_tpu.solver import solve

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _params(n=16, **kw):
    kw.setdefault("problem", 1)
    kw.setdefault("i_max", n)
    kw.setdefault("j_max", n)
    kw.setdefault("T", 0.05)
    kw.setdefault("Re", 100.0)
    kw.setdefault("tau", 0.5)
    kw.setdefault("epsilon", 1e-4)
    kw.setdefault("max_it", 500)
    kw.setdefault("dtype", "float32")
    return Params(**kw)


@pytest.mark.parametrize("method", ["rb_sor", "mg", "cg", "fft"])
def test_gspmd_matches_single_chip(method):
    params = _params(16)
    mesh = make_grid_mesh(8, params.i_max, params.j_max)
    ref_state, ref_stats = solve(params, pressure_method=method)
    g_state, g_stats = gspmd.solve_gspmd(params, mesh=mesh,
                                         pressure_method=method)
    assert int(g_stats.steps) == int(ref_stats.steps)
    for name in ("u", "v", "p"):
        assert_close_reference_contract(
            np.asarray(getattr(ref_state, name)),
            np.asarray(getattr(g_state, name)),
        )


def test_gspmd_output_actually_sharded():
    """The solve must come back block-sharded over the full mesh — i.e. XLA
    really partitioned the program instead of replicating it."""
    params = _params(16)
    mesh = make_grid_mesh(8, params.i_max, params.j_max)
    placed = gspmd.place_state(allocate_state(params), mesh)
    out, _ = gspmd._make_solve(
        params.replace(disable_pallas=True), mesh, "rb_sor")(placed)
    sh = out.u.sharding
    assert len(sh.device_set) == 8
    assert not sh.is_fully_replicated
    assert sh.spec == jax.sharding.PartitionSpec(*MESH_AXES)


def test_gspmd_odd_grid_no_divisibility_requirement():
    """GSPMD pads shards internally: the reference's default-style odd grid
    (parameters.txt: 257^2) needs no pad-to-divisible machinery here."""
    params = _params(17)
    mesh = make_grid_mesh(8, params.i_max, params.j_max)
    ref_state, _ = solve(params)
    g_state, _ = gspmd.solve_gspmd(params, mesh=mesh)
    for name in ("u", "v", "p"):
        assert_close_reference_contract(
            np.asarray(getattr(ref_state, name)),
            np.asarray(getattr(g_state, name)),
        )


def test_gspmd_rejects_pallas_method():
    with pytest.raises(ValueError, match="gspmd backend supports"):
        gspmd.solve_gspmd(_params(16), pressure_method="pallas_sor")


def test_gspmd_stepper_host_loop():
    """GspmdStepper powers periodic output/checkpointing: stepping one step
    at a time must land exactly where the monolithic solve does."""
    params = _params(16)
    mesh = make_grid_mesh(8, params.i_max, params.j_max)
    ref_state, ref_stats = solve(params)
    stepper = gspmd.GspmdStepper(params, allocate_state(params), mesh=mesh)
    iters = 0
    while stepper.t < params.T:
        diag = stepper.step()
        iters += int(diag.sor_iterations)
    st = stepper.state()
    assert stepper.n == int(ref_stats.steps)
    for name in ("u", "v", "p"):
        assert_close_reference_contract(
            np.asarray(getattr(ref_state, name)), np.asarray(getattr(st, name))
        )


def test_gspmd_cli_backend(tmp_path):
    """End-to-end through the CLI protocol (stdout center values)."""
    import io
    from contextlib import redirect_stderr, redirect_stdout

    from navierstokes_parallel_tpu import cli

    cfg = tmp_path / "tiny.in"
    _params(16, T=0.02).to_file(str(cfg))
    ref_out, g_out = io.StringIO(), io.StringIO()
    with redirect_stdout(ref_out), redirect_stderr(io.StringIO()):
        assert cli.main([str(cfg), "--backend", "jnp"]) == 0
    with redirect_stdout(g_out), redirect_stderr(io.StringIO()):
        assert cli.main([str(cfg), "--backend", "gspmd"]) == 0

    def centers(text):
        return [float(line.split(":")[1]) for line in text.splitlines()
                if line.startswith(("U-CENTER", "V-CENTER"))]

    np.testing.assert_allclose(centers(g_out.getvalue()),
                               centers(ref_out.getvalue()), atol=1e-4)


def test_gspmd_cli_checkpoint_resume(tmp_path):
    """Elastic-recovery twin for the gspmd backend: a --max-steps chunked
    run with checkpoints resumes to the same end state as one straight run
    (the single-chip and shard_map backends have the same test)."""
    import io
    from contextlib import redirect_stderr, redirect_stdout

    from navierstokes_parallel_tpu import cli

    cfg = tmp_path / "tiny.in"
    # tau=0.2 -> dt ~ 0.01, so T=0.1 is ~10 steps: the 3-step chunks below
    # must hit the incomplete-exit (rc 3) path several times before T.
    _params(16, T=0.1, tau=0.2).to_file(str(cfg))
    ck = tmp_path / "ck.npz"

    straight = io.StringIO()
    with redirect_stdout(straight), redirect_stderr(io.StringIO()):
        assert cli.main([str(cfg), "--backend", "gspmd"]) == 0

    chunked = io.StringIO()
    with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
        rc = cli.main([str(cfg), "--backend", "gspmd", "--max-steps", "3",
                       "--checkpoint-every", "1",
                       "--checkpoint-path", str(ck)])
    assert rc == 3 and ck.exists()
    while rc == 3:
        chunked = io.StringIO()
        with redirect_stdout(chunked), redirect_stderr(io.StringIO()):
            rc = cli.main([str(cfg), "--backend", "gspmd", "--max-steps", "3",
                           "--checkpoint-every", "1",
                           "--checkpoint-path", str(ck),
                           "--resume", str(ck)])
    assert rc == 0

    def centers(text):
        return [float(line.split(":")[1]) for line in text.splitlines()
                if line.startswith(("U-CENTER", "V-CENTER"))]

    np.testing.assert_allclose(centers(chunked.getvalue()),
                               centers(straight.getvalue()), atol=1e-6)


def test_gspmd_rejects_trivial_axis_mesh():
    """(1,N)/(N,1) meshes must be refused loudly: the partitioner
    miscompiles boundary scatter compositions there (see the canary below)
    and every pressure method returned silently wrong fields."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:6]).reshape(1, 6)
    mesh = Mesh(devs, MESH_AXES)
    with pytest.raises(ValueError, match="trivial"):
        gspmd.solve_gspmd(_params(16), mesh=mesh)
    with pytest.raises(ValueError, match="trivial"):
        gspmd.GspmdStepper(_params(16), allocate_state(_params(16)),
                           mesh=mesh)


def test_gspmd_square_mesh_chooser():
    from navierstokes_parallel_tpu.parallel.topology import (
        choose_mesh_shape_square,
    )

    assert choose_mesh_shape_square(8) in ((2, 4), (4, 2))
    assert choose_mesh_shape_square(6) in ((2, 3), (3, 2))
    assert choose_mesh_shape_square(4) == (2, 2)
    assert choose_mesh_shape_square(1) == (1, 1)
    with pytest.raises(ValueError, match="prime"):
        choose_mesh_shape_square(7)


def test_xla_trivial_axis_scatter_canary():
    """CANARY for the upstream XLA SPMD bug that motivates _check_mesh:
    composing a row slice-update with a column slice-update on a mesh with
    one trivial axis returns WRONG VALUES (jax 0.9.0, CPU backend).  If
    this test ever FAILS (i.e. the composition becomes correct), upstream
    fixed the partitioner — lift the gspmd trivial-axis mesh rejection."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((18, 18)).astype(np.float32)

    def ghostish(p):
        return p.at[0, 1:-1].set(p[1, 1:-1]).at[1:-1, 0].set(p[1:-1, 1])

    ref = np.asarray(ghostish(jnp.asarray(x0)))
    mesh = Mesh(np.array(jax.devices()[:6]).reshape(1, 6), MESH_AXES)
    xj = jax.device_put(jnp.asarray(x0), NamedSharding(mesh, P(*MESH_AXES)))
    out = np.asarray(jax.jit(ghostish)(xj))
    err = float(np.abs(out - ref).max())
    assert err > 1e-3, (
        f"the trivial-axis scatter composition now computes CORRECTLY "
        f"(max err {err:.3e}) — upstream XLA fixed the SPMD bug; remove "
        f"gspmd._check_mesh's rejection and this canary"
    )
