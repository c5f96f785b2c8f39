"""Unit tests for the ppermute halo exchange (parallel/halo.py)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from navierstokes_parallel_tpu.parallel import halo, topology


def _mesh22():
    return topology.make_grid_mesh(4, 16, 16)  # (2, 2)


def test_exchange_halo_neighbors():
    """Each shard's halo ring must equal its neighbor's adjacent interior
    strip, including diagonal corners."""
    mesh = _mesh22()
    li = lj = 8

    def body(block):
        local = jnp.pad(block, 1)
        return halo.exchange_halo(local)

    x = jnp.arange(16 * 16, dtype=jnp.float32).reshape(16, 16)
    mapped = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"),
        check_vma=False,
    ))
    out = np.asarray(mapped(x))  # (2*10, 2*10) stacked local padded blocks

    blocks = {}
    for bi in range(2):
        for bj in range(2):
            blocks[(bi, bj)] = out[bi * 10:(bi + 1) * 10, bj * 10:(bj + 1) * 10]
    ref = np.asarray(x)

    b00 = blocks[(0, 0)]
    # east halo of block (0,0) = first interior column of block (1,0)
    np.testing.assert_array_equal(b00[-1, 1:-1], ref[8, 0:8])
    # north halo = first interior row of block (0,1)
    np.testing.assert_array_equal(b00[1:-1, -1], ref[0:8, 8])
    # diagonal corner = block (1,1)'s first interior cell
    assert b00[-1, -1] == ref[8, 8]
    # physical-edge halos are zeros (ppermute with no source)
    np.testing.assert_array_equal(b00[0, :], 0.0)
    np.testing.assert_array_equal(b00[:, 0], 0.0)


def test_neumann_closure():
    mesh = _mesh22()

    def body(block):
        return halo.neumann_or_exchange(jnp.pad(block, 1))

    x = jnp.arange(16 * 16, dtype=jnp.float32).reshape(16, 16) + 1.0
    mapped = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"),
        check_vma=False,
    ))
    out = np.asarray(mapped(x))
    b00 = out[0:10, 0:10]
    ref = np.asarray(x)
    # physical west halo = own first interior column (Neumann copy)
    np.testing.assert_array_equal(b00[0, 1:-1], ref[0, 0:8])
    np.testing.assert_array_equal(b00[1:-1, 0], ref[0:8, 0])
