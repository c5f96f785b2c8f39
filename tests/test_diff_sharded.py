"""Sharded differentiable path (round-4 verdict item 10): `jax.grad`
THROUGH a multi-chip integration.

`diff.solve_n_steps(mesh=...)` pins a block-sharding constraint on the
carried fields inside the remat scan; XLA's SPMD partitioner shards the
forward scan and its transpose alike — including the IFT adjoint pressure
solves, which are plain jnp solver calls inside the custom_vjp.  The
contract here is exact gradient parity with the single-chip path (same
math, same program order — CPU-mesh partitioning is numerically
transparent at these sizes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from navierstokes_parallel_tpu import diff
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.grid import allocate_state
from navierstokes_parallel_tpu.parallel.topology import MESH_AXES


def _mesh(px, py):
    devs = jax.devices()
    if len(devs) < px * py:
        pytest.skip(f"needs {px * py} devices")
    return Mesh(np.asarray(devs[: px * py]).reshape(px, py), MESH_AXES)


def _params(**kw):
    defaults = dict(problem=1, i_max=16, j_max=16, a=1.0, b=1.0, T=1.0,
                    Re=100.0, tau=0.5, omega=1.7, epsilon=1e-9,
                    max_it=20000, dtype="float64")
    defaults.update(kw)
    return Params(**defaults)


def _loss(params, mesh, n_steps=3, method="mg"):
    def loss(state, controls):
        final, _ = diff.solve_n_steps(params, state, n_steps,
                                      controls=controls,
                                      pressure_method=method, mesh=mesh)
        return (jnp.sum(final.u[1:-1, 1:-1] ** 2)
                + jnp.sum(final.v[1:-1, 1:-1] ** 2))
    return loss


def test_sharded_grad_parity_controls_and_state():
    """grad w.r.t. (Controls, initial state) on a 2x4 mesh == single-chip,
    for the lid-control setup (the verdict's demo loss).  16x16 does not
    divide the mesh y-axis evenly — with_sharding_constraint handles the
    ragged shards (no padding needed inside jit)."""
    params = _params()
    state = allocate_state(params)
    c0 = diff.default_controls(params)
    mesh = _mesh(2, 4)

    def wrap(mesh_arg):
        ls = _loss(params, mesh_arg, n_steps=2)
        # allow_int: the State pytree carries the int32 step counter `n`
        # (its cotangent is float0 and is not compared below).
        val, grads = jax.value_and_grad(ls, argnums=(0, 1),
                                        allow_int=True)(state, c0)
        return val, grads

    v1, (gs1, gc1) = wrap(None)
    v2, (gs2, gc2) = jax.jit(lambda: wrap(mesh))()
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(float(gc1.lid_scale), float(gc2.lid_scale),
                               rtol=1e-10)
    np.testing.assert_allclose(float(gc1.g_y), float(gc2.g_y), rtol=1e-10,
                               atol=1e-12)
    for name in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(gs1, name)),
                                   np.asarray(getattr(gs2, name)),
                                   atol=1e-10, err_msg=name)


def test_sharded_grad_obstacle_domain():
    """The masked IFT adjoint (_ift_bwd_masked) shards too: gradient
    parity on an obstacle cavity."""
    params = _params(i_max=16, j_max=16,
                     obstacles=((6, 10, 6, 10),))
    state = allocate_state(params)
    c0 = diff.default_controls(params)
    mesh = _mesh(2, 2)
    g1 = jax.grad(_loss(params, None, n_steps=2), allow_int=True)(state, c0)
    g2 = jax.jit(jax.grad(_loss(params, mesh, n_steps=2),
                          allow_int=True))(state, c0)
    np.testing.assert_allclose(np.asarray(g1.u), np.asarray(g2.u),
                               atol=1e-10)


def test_sharded_diff_rejects_1d_mesh():
    params = _params()
    with pytest.raises(ValueError, match="mesh"):
        diff.solve_n_steps(params, allocate_state(params), 1,
                           mesh=_mesh(1, 8))


def test_sharded_grad_thermal():
    """solve_thermal_n_steps(mesh=...): gradient w.r.t. the buoyancy
    coefficient through a sharded Boussinesq integration == single-chip
    (the temperature field shards with u/v/p under the same constraint)."""
    from navierstokes_parallel_tpu.models import convection as conv

    params = _params(problem=1, i_max=16, j_max=16, Re=200.0)
    cfg = conv.ThermalConfig(alpha=1.0 / (params.Re * 0.71),
                             beta_gx=0.0, beta_gy=-1.0)
    ts0 = conv.allocate_thermal(params, cfg)
    mesh = _mesh(2, 2)

    def loss_of_beta(beta, mesh_arg):
        c = cfg._replace(beta_gy=beta)
        final, _ = diff.solve_thermal_n_steps(params, ts0, 2, c,
                                              pressure_method="mg",
                                              mesh=mesh_arg)
        return jnp.sum(final.v[1:-1, 1:-1] ** 2)

    g1 = jax.grad(lambda b: loss_of_beta(b, None))(jnp.float64(-1.0))
    g2 = jax.jit(jax.grad(lambda b: loss_of_beta(b, mesh)))(
        jnp.float64(-1.0))
    assert float(g1) != 0.0
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-10)
