"""Pallas TPU kernel: K red-black SOR sweeps with the field resident in VMEM.

This is the TPU equivalent of the reference's flagship CUDA kernel
`sor_shared_memory_kernel` (src/parallel/main.cu:384-511) — but structurally
better placed: the CUDA version stages one (block+2)^2 tile into shared
memory, performs ONE half-sweep, and must round-trip through global memory
and a host sync for every half-sweep (main.cu:684-698).  Here the WHOLE grid
(correction field delta + right-hand side) stays in VMEM for K complete
red-black sweeps: HBM is touched exactly twice per K sweeps (load rhs, store
delta), and there is no sync of any kind.

The kernel computes `delta` = K red-black SOR sweeps applied to
A delta = rhs_neg starting from delta = 0 — the inner stage of the
mixed-precision refinement solver (ops/sor.py), which owns the f64 master
pressure, the defect computation, and the reference convergence rule.

Neighbor access uses circular rolls of the full padded array: the wrap-around
values land only in the ghost ring, which the interior mask excludes, and the
ghost ring itself is refreshed by the Neumann fill before every half-sweep —
so no unaligned slicing is needed anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import Params

# Reserved hook for future tiled variants (the analogue of the reference's
# CUDA block-size CLI argument, main.cu:987-1000).  The current kernel keeps
# the whole grid in VMEM, so there is no tile size to choose.
_DEFAULT_TILE = None


def set_default_tile(tile_size: int) -> None:
    global _DEFAULT_TILE
    _DEFAULT_TILE = tile_size


def _roll(x, shift, axis):
    # pltpu.roll requires a non-negative shift; -1 == size-1 circularly.
    # The int32 cast matters twice over: under x64 a bare int becomes an i64
    # operand which tpu.dynamic_rotate rejects, and a static np.int32 shift
    # sends Mosaic down a path that hangs compilation (observed on v5e).
    return pltpu.roll(x, jnp.asarray(shift % x.shape[axis], jnp.int32), axis)


def _make_kernel(shape, omega, dx2_inv, dy2_inv, use_pltpu_roll):
    """Build the kernel body with all solver constants baked in."""
    ni, nj = shape  # padded (i_max+2, j_max+2)
    coef = omega / (2.0 * (dx2_inv + dy2_inv))
    roll = _roll if use_pltpu_roll else jnp.roll

    def make_masks():
        # Built inside the kernel: pallas kernels cannot capture array
        # constants.  (ii + jj) equals the reference's global (i + j) parity
        # (main.cu:490): padded index == 1-based global index.
        ii = lax.broadcasted_iota(jnp.int32, shape, 0)
        jj = lax.broadcasted_iota(jnp.int32, shape, 1)
        interior = (ii >= 1) & (ii <= ni - 2) & (jj >= 1) & (jj <= nj - 2)
        par = (ii + jj) & 1  # cheap parity; Mosaic lowers & natively
        red = interior & (par == 0)
        black = interior & (par == 1)
        # Neumann BC folded into a per-cell self-coefficient: the ghost
        # neighbor of a boundary-adjacent cell equals the cell itself (the
        # reference refills the ghost ring every half-sweep to achieve this,
        # integration.c:138-146 / main.cu:686).  The rolled ghost ring
        # contributes zero, and `self_coef * d` adds the missing neighbor(s).
        f32 = jnp.float32
        self_coef = (
            ((ii == 1).astype(f32) + (ii == ni - 2).astype(f32)) * dx2_inv
            + ((jj == 1).astype(f32) + (jj == nj - 2).astype(f32)) * dy2_inv
        )
        return red, black, self_coef

    def half_sweep(d, rhs, mask, self_coef):
        nb = (
            (roll(d, 1, 0) + roll(d, -1, 0)) * dx2_inv
            + (roll(d, 1, 1) + roll(d, -1, 1)) * dy2_inv
            + d * self_coef
        )
        d_new = (1.0 - omega) * d + coef * (nb - rhs)
        return jnp.where(mask, d_new, d)

    def kernel(ns_ref, rhs_ref, out_ref):
        rhs = rhs_ref[:]
        red, black, self_coef = make_masks()

        def sweep(_, d):
            d = half_sweep(d, rhs, red, self_coef)
            d = half_sweep(d, rhs, black, self_coef)
            return d

        out_ref[:] = lax.fori_loop(0, ns_ref[0], sweep, jnp.zeros_like(rhs))

    return kernel


@functools.partial(jax.jit, static_argnames=("shape", "omega", "dx2_inv",
                                             "dy2_inv", "interpret"))
def _sweeps_call(n_sweeps, rhs_neg, *, shape, omega, dx2_inv, dy2_inv,
                 interpret):
    kernel = _make_kernel(shape, omega, dx2_inv, dy2_inv,
                          use_pltpu_roll=not interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(n_sweeps, rhs_neg)


def vmem_bytes_required(params: Params) -> int:
    """Rough VMEM footprint: delta + rhs + one temp, tile-padded."""
    ni, nj = params.shape

    def pad(a, m):
        return -(-a // m) * m

    per_array = pad(ni, 8) * pad(nj, 128) * 4
    return 3 * per_array


def fits_in_vmem(params: Params, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    return vmem_bytes_required(params) <= budget_bytes


def inner_sweeps(rhs_neg: jax.Array, n_sweeps, params: Params) -> jax.Array:
    """Drop-in replacement for the refinement solver's inner stage: K f32
    red-black sweeps on A delta = rhs_neg from delta = 0, fully in VMEM."""
    interpret = jax.default_backend() != "tpu"
    ns = jnp.asarray(n_sweeps, jnp.int32).reshape(1)
    return _sweeps_call(
        ns,
        rhs_neg.astype(jnp.float32),
        shape=params.shape,
        omega=float(params.omega),
        dx2_inv=float(1.0 / (params.dx * params.dx)),
        dy2_inv=float(1.0 / (params.dy * params.dy)),
        interpret=interpret,
    )
