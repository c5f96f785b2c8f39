"""Fused momentum Pallas kernel parity (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.ops import momentum
from navierstokes_parallel_tpu.ops.pallas import momentum_kernel


def test_fused_momentum_matches_xla():
    n = 24
    prm = Params(i_max=n, j_max=n, Re=150.0, g_x=0.3, g_y=-0.2,
                 a=2.0, b=1.0, dtype="float32")
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)).astype(np.float32))
    dt, gamma = 0.01, 0.6

    F0, G0 = momentum.compute_fg(u, v, dt, gamma, prm)
    rhs0 = momentum.compute_rhs(F0, G0, dt, prm)
    F1, G1, rhs1 = momentum_kernel.momentum_rhs(u, v, dt, gamma, prm)

    np.testing.assert_allclose(np.asarray(F1), np.asarray(F0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G0), atol=1e-6)
    scale = float(jnp.max(jnp.abs(rhs0)))
    np.testing.assert_allclose(np.asarray(rhs1) / scale,
                               np.asarray(rhs0) / scale, atol=1e-6)


def test_usable_gates_cpu():
    prm = Params(i_max=16, j_max=16, dtype="float32")
    assert not momentum_kernel.usable(prm)  # tests force CPU backend
