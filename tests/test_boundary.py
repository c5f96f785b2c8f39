"""Boundary-condition tests against the serial-semantics oracle
(reference boundaries.c:7-39)."""

import numpy as np
import jax.numpy as jnp

from navierstokes_parallel_tpu.ops import boundary
from navierstokes_parallel_tpu import oracle


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n + 2, n + 2)), rng.standard_normal((n + 2, n + 2))


def test_cavity_bcs_match_oracle():
    n = 9
    u0, v0 = _rand(n, 0)
    lid = 0.37

    uo, vo = u0.copy(), v0.copy()
    oracle._apply_bcs(uo, vo, n, n, lid)

    uj, vj = boundary.apply_cavity_bcs(jnp.asarray(u0), jnp.asarray(v0), lid)
    np.testing.assert_allclose(np.asarray(uj), uo, atol=1e-14)
    np.testing.assert_allclose(np.asarray(vj), vo, atol=1e-14)


def test_noslip_walls_zero_normal_velocity():
    n = 8
    u0, v0 = _rand(n, 1)
    u, v = boundary.apply_cavity_bcs(jnp.asarray(u0), jnp.asarray(v0), 1.0)
    u, v = np.asarray(u), np.asarray(v)
    # Normal velocities vanish on the three no-slip walls.
    np.testing.assert_array_equal(u[0, 1:-1], 0.0)      # left wall u
    np.testing.assert_array_equal(u[n, 1:-1], 0.0)      # right wall u
    np.testing.assert_array_equal(v[1:-1, 0], 0.0)      # bottom wall v
    np.testing.assert_array_equal(v[1:-1, n], 0.0)      # lid v
    # Tangential ghost reflection: average of ghost and interior = wall value.
    # (The lid-adjacent entry j = j_max is excluded: LEFT/RIGHT reflect
    # against pre-TOP values — reference BC application order, main.c:95-104.)
    np.testing.assert_allclose((v[0, 1:-2] + v[1, 1:-2]) / 2, 0.0, atol=1e-15)
    np.testing.assert_allclose((u[1:-1, 0] + u[1:-1, 1]) / 2, 0.0, atol=1e-15)
    # Lid: average of ghost and interior u = lid speed 1.0.
    np.testing.assert_allclose((u[1:-1, n + 1] + u[1:-1, n]) / 2, 1.0, atol=1e-15)


def test_oscillating_lid_velocity():
    t = jnp.asarray(0.3)
    lid = boundary.lid_velocity(2, 10.0, t)
    np.testing.assert_allclose(float(lid), np.sin(3.0), rtol=1e-12)
    lid1 = boundary.lid_velocity(1, 10.0, t)
    assert float(lid1) == 1.0
