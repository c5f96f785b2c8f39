"""Multi-chip obstacle domains on the shard_map deep-halo path.

Round-4 capability (round-3 verdict item 3): the communication-avoiding
deep-halo inner generalized to the masked neighbor-weight operator
(parallel/deep_halo.py::_ext_sweeps_masked + the residual_fn hook in
ops/sor.py), with the obstacle velocity BCs rebuilt per shard from global
indices (parallel/sharded.py::_apply_obstacle_bcs_sharded).

Validation mirrors the single-chip obstacle suite: exact domain
equivalence (half-blocked cavity == half-height cavity THROUGH the
sharded masked path), agreement with the single-chip masked solver on
the backward-facing step, and the communication-avoidance exchange-count
assertion on the masked inner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu import solver
from navierstokes_parallel_tpu.parallel import deep_halo, sharded
from navierstokes_parallel_tpu.parallel.topology import (
    grid_sharding,
    local_block_dims,
    make_grid_mesh,
)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


_COMMON = dict(Re=100.0, T=0.1, tau=0.5, omega=1.7, epsilon=1e-6,
               max_it=20000, dtype="float32")


def test_sharded_half_blocked_equals_half_cavity():
    """A cavity whose bottom half is one obstacle, solved MULTI-CHIP on
    the 8-device mesh through the masked deep-halo inner, must reproduce
    the plain (obstacle-free) half-height cavity — the same exact-domain-
    equivalence check the single-chip masked solvers pass, now across
    shard seams that cut straight through the obstacle."""
    n = 32
    full = Params(problem=1, i_max=n, j_max=n, a=1.0, b=1.0,
                  obstacles=((1, n, 1, n // 2),), **_COMMON)
    half = Params(problem=1, i_max=n, j_max=n // 2, a=1.0, b=0.5, **_COMMON)
    st_sh, stats_sh = sharded.solve_sharded(full, pressure_method="rb_sor")
    st_half, stats_half = solver.solve(half, pressure_method="rb_sor")
    assert int(stats_sh.sor_failures) == 0
    assert int(stats_half.sor_failures) == 0
    assert int(stats_sh.steps) == int(stats_half.steps)
    uf = np.asarray(st_sh.u, np.float64)[:, n // 2 + 1: n + 1]
    uh = np.asarray(st_half.u, np.float64)[:, 1: n // 2 + 1]
    vf = np.asarray(st_sh.v, np.float64)[:, n // 2 + 1: n + 1]
    vh = np.asarray(st_half.v, np.float64)[:, 1: n // 2 + 1]
    # f32 state + different reduction orders across the two paths: assert
    # the 1e-4 reference comparator contract (conftest), not bitwise.
    from navierstokes_parallel_tpu.utils.io import tolerance_errors

    assert float(np.max(tolerance_errors(uf, uh))) <= 1e-4
    assert float(np.max(tolerance_errors(vf, vh))) <= 1e-4


def test_sharded_bfs_matches_single_chip():
    """Backward-facing step (the flagship obstacle workload) sharded vs
    single-chip masked rb_sor: 1e-4 comparator contract on u and v."""
    from navierstokes_parallel_tpu.models import step as step_model
    from navierstokes_parallel_tpu.utils.io import tolerance_errors

    params = step_model.backward_facing_step(Re=100.0, nx=64, ny=16,
                                             T=0.6, dtype="float32")
    # Tight per-solve tolerance: both paths converge each pressure solve
    # independently, so per-step drift is O(epsilon) and compounds over
    # the ~30-step run — 1e-6 keeps the accumulated difference inside
    # the 1e-4 comparator contract.
    params = params.replace(epsilon=1e-6)
    st_sh, stats_sh = sharded.solve_sharded(params, pressure_method="rb_sor")
    st_sc, stats_sc = solver.solve(params, pressure_method="rb_sor")
    assert int(stats_sh.sor_failures) == 0
    assert int(stats_sh.steps) == int(stats_sc.steps)
    for got, ref in ((st_sh.u, st_sc.u), (st_sh.v, st_sc.v)):
        err = float(np.max(tolerance_errors(
            np.asarray(got, np.float64), np.asarray(ref, np.float64))))
        assert err <= 1e-4, f"sharded bfs max comparator error {err:.3e}"


def test_masked_deep_inner_matches_single_chip_masked():
    """The masked deep-halo inner (fixed sweep count, no outer) must match
    the single-chip masked sweeps cell for cell — same diag-form
    arithmetic, so agreement is to f32 roundoff."""
    from navierstokes_parallel_tpu.ops import masked as maskedmod

    n = 32
    params = Params(problem=1, i_max=n, j_max=n,
                    obstacles=((9, 16, 13, 20),), sor_comm_every=4,
                    **_COMMON)
    rng = np.random.default_rng(3)
    rhs_int = rng.standard_normal((n, n)).astype(np.float32)
    w = maskedmod._weights(params)
    rhs_int = np.where(w.fluid, rhs_int, 0.0).astype(np.float32)
    rhs_full = np.zeros((n + 2, n + 2), np.float32)
    rhs_full[1:-1, 1:-1] = rhs_int

    # Single-chip: n_sweeps masked red-black sweeps from zero.
    red, black = maskedmod._color_masks(params, w)
    d = jnp.zeros((n + 2, n + 2), jnp.float32)
    n_sweeps = 12
    for _ in range(n_sweeps):
        d = maskedmod.masked_rb_iteration(
            d, jnp.asarray(rhs_int), jnp.float32(params.omega), w, red,
            black)
    want = np.asarray(d)

    # Sharded: the masked deep-halo inner over the 8-device mesh.
    mesh = make_grid_mesh(8, n, n)
    px, py = mesh.devices.shape
    li, lj = local_block_dims((px, py), n, n)

    def local_fn(rhs_block):
        inner = deep_halo.make_deep_inner(params, li, lj)
        return inner(rhs_block, jnp.asarray(n_sweeps, jnp.int32))

    mapped = jax.jit(shard_map(
        local_fn, mesh=mesh, in_specs=(P("x", "y"),),
        out_specs=P("x", "y"), check_vma=False))
    dims = (px, py, li, lj)
    blocks = sharded._put_blocks(
        sharded._scatter_blocks(rhs_full, *dims), grid_sharding(mesh))
    got = sharded._gather_blocks(np.asarray(mapped(blocks)), *dims,
                                 params.shape)
    np.testing.assert_allclose(got[1:-1, 1:-1], want[1:-1, 1:-1],
                               atol=1e-6)


def test_masked_inner_exchange_count():
    """Communication avoidance holds for the masked inner too: the static
    ppermute count (one rhs extend + one per-chunk delta extend) is
    independent of K."""
    def count(jaxpr, acc=0):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "ppermute":
                acc += 1
            for sub in jax.core.subjaxprs(eqn.params):
                acc = count(sub, acc)
        return acc

    # jax.core.subjaxprs may not exist across versions — fall back to the
    # repr scan the deep-halo tests use.
    def count_str(jaxpr):
        return repr(jaxpr).count("ppermute")

    mesh = make_grid_mesh(8, 32, 32)
    px, py = mesh.devices.shape
    li, lj = local_block_dims((px, py), 32, 32)

    def traced(k):
        p = Params(problem=1, i_max=32, j_max=32,
                   obstacles=((9, 16, 13, 20),), sor_comm_every=k,
                   **_COMMON)

        def local_fn(rhs_block):
            inner = deep_halo.make_deep_inner(p, li, lj)
            return inner(rhs_block, jnp.asarray(64, jnp.int32))

        mapped = shard_map(local_fn, mesh=mesh, in_specs=(P("x", "y"),),
                           out_specs=P("x", "y"), check_vma=False)
        spec = jax.ShapeDtypeStruct((px * (li + 2), py * (lj + 2)),
                                    jnp.float32)
        return jax.make_jaxpr(mapped)(spec)

    assert count_str(traced(4)) == count_str(traced(8))


def test_sharded_obstacle_gating():
    """mg/fft/cg and second-order surfaces reject cleanly on the sharded
    backend with actionable messages."""
    n = 32
    params = Params(problem=1, i_max=n, j_max=n,
                    obstacles=((9, 16, 13, 20),), **_COMMON)
    mesh = make_grid_mesh(8, n, n)
    for method in ("mg", "fft", "cg"):
        with pytest.raises(ValueError, match="masked deep-halo"):
            sharded._check_method(params, mesh, method)
    # Sharp surfaces (ghost-fluid BCs + cut-cell apertures) are supported
    # on the deep-halo rb_sor route since round 4 — but still reject the
    # masked-mg combination like every other sharded obstacle run.
    sharp = params.replace(
        obstacle_surfaces=(("box", 0.25, 0.5, 0.375, 0.625),))
    sharded._check_method(sharp, mesh, "rb_sor")
    with pytest.raises(ValueError, match="masked deep-halo"):
        sharded._check_method(sharp, mesh, "mg")


def test_sharded_sharp_circle_matches_single_chip():
    """Sharp geometry multi-chip: a rasterized disk with its analytic
    circle level set (ghost-fluid velocity BCs + cut-cell aperture
    pressure operator) solved on the 8-device mesh must match the
    single-chip solve under the 1e-4 comparator contract — the BC
    weights and face fractions reach every shard as dynamic slices of
    the SAME global constants the single-chip path folds in."""
    from navierstokes_parallel_tpu.models import karman
    from navierstokes_parallel_tpu.ops import obstacles as obs
    from navierstokes_parallel_tpu.utils.io import tolerance_errors

    n = 32
    dx = dy = 1.0 / n
    cx = cy = 0.5
    d = 0.35
    rects = karman.circle_rects(cx, cy, d, dx, dy, n, n)
    params = Params(problem=1, i_max=n, j_max=n, obstacles=rects,
                    obstacle_surfaces=(("circle", cx, cy, 0.5 * d),),
                    **_COMMON)
    assert obs.aperture_active(params)
    st_sh, stats_sh = sharded.solve_sharded(params,
                                            pressure_method="rb_sor")
    st_sc, stats_sc = solver.solve(params, pressure_method="rb_sor")
    assert int(stats_sh.sor_failures) == 0
    assert int(stats_sc.sor_failures) == 0
    assert int(stats_sh.steps) == int(stats_sc.steps)
    for a, b in ((st_sh.u, st_sc.u), (st_sh.v, st_sc.v)):
        err = tolerance_errors(np.asarray(a, np.float64),
                               np.asarray(b, np.float64))
        assert float(np.max(err)) <= 1e-4


def test_sharded_sharp_staircase_knob_still_runs():
    """obstacle_pressure='staircase' with surfaces on the sharded path:
    ghost-fluid velocity BCs, binary pressure weights — must run and
    match the single-chip solve (the A/B configuration for the ladder)."""
    from navierstokes_parallel_tpu.utils.io import tolerance_errors

    n = 32
    # T=0.03 (~3 steps): the knob/parity contract is per-step, so a short
    # run exercises the same code paths as the old T=0.1 at a third of the
    # single-core cost.
    params = Params(problem=1, i_max=n, j_max=n,
                    obstacles=((9, 16, 13, 20),),
                    obstacle_surfaces=(("box", 0.26, 0.5, 0.39, 0.625),),
                    obstacle_pressure="staircase",
                    **{**_COMMON, "T": 0.03})
    st_sh, stats_sh = sharded.solve_sharded(params,
                                            pressure_method="rb_sor")
    st_sc, stats_sc = solver.solve(params, pressure_method="rb_sor")
    assert int(stats_sh.steps) == int(stats_sc.steps)
    err = tolerance_errors(np.asarray(st_sh.u, np.float64),
                           np.asarray(st_sc.u, np.float64))
    assert float(np.max(err)) <= 1e-4
