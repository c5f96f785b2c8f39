"""Fused momentum kernel: F, G and the Poisson RHS in one VMEM pass.

The reference computes these with three separate CUDA kernels
(calculate_F_kernel / calculate_G_kernel / calculate_RHS_kernel,
src/parallel/main.cu:352-382, 219-229), each round-tripping global memory.
Here the eight donor-cell/diffusive stencils (integration.c:7-96), the wall
values F=u / G=v, and RHS = div(F,G)/dt (main.c:116-120) are evaluated in a
single gridless Pallas program: u and v are read from VMEM once, all
neighbor access is circular rolls (wrap lands only in masked-out ghost
cells), and F, G, rhs are written once.

Semantics identical to ops/momentum.compute_fg + compute_rhs (the masks
reproduce the guarded loop domains); verified bit-level against them in the
test suite.  Single-chip, grids that fit VMEM; larger grids and CPU keep
the fused-XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import Params
# _dynamic_roll (tpu.dynamic_rotate), NOT the static-slice _roll: this
# kernel runs once per time step (sweep cost dominates elsewhere) and the
# static form's slice-concat temporaries overflow its VMEM budget at
# 512^2+ (observed 20.4M vs 16M limit).
from .sor_kernel import _dynamic_roll as _roll, fits_in_vmem


def _make_kernel(shape, i_max, j_max, dx, dy, Re, g_x, g_y, use_pltpu_roll):
    ni, nj = shape
    roll = _roll if use_pltpu_roll else jnp.roll
    f32 = jnp.float32
    inv_dx, inv_dy = 1.0 / dx, 1.0 / dy
    inv_re = 1.0 / Re

    def kernel(scal_ref, u_ref, v_ref, F_ref, G_ref, rhs_ref):
        dt = scal_ref[0]
        gamma = scal_ref[1]
        u = u_ref[:]
        v = v_ref[:]

        ii = lax.broadcasted_iota(jnp.int32, shape, 0)
        jj = lax.broadcasted_iota(jnp.int32, shape, 1)
        j_int = (jj >= 1) & (jj <= j_max)
        i_int = (ii >= 1) & (ii <= i_max)
        # Guarded domains (integration.c:75-91): F computed on i<=i_max-1,
        # G on j<=j_max-1; wall values F=u, G=v on the remaining edges.
        f_compute = (ii >= 1) & (ii <= i_max - 1) & j_int
        f_wall = ((ii == 0) | (ii == i_max)) & j_int
        g_compute = (jj >= 1) & (jj <= j_max - 1) & i_int
        g_wall = ((jj == 0) | (jj == j_max)) & i_int
        interior = i_int & j_int

        u_e, u_w = roll(u, -1, 0), roll(u, 1, 0)
        u_n, u_s = roll(u, -1, 1), roll(u, 1, 1)
        v_e, v_w = roll(v, -1, 0), roll(v, 1, 0)
        v_n, v_s = roll(v, -1, 1), roll(v, 1, 1)
        v_se = roll(v_e, 1, 1)   # v[i+1][j-1]
        u_nw = roll(u_w, -1, 1)  # u[i-1][j+1]

        # --- F (u-momentum), integration.c:73-83 ---------------------------
        ae = 0.5 * (u + u_e)
        aw = 0.5 * (u_w + u)
        du2dx = (ae * ae - aw * aw) * inv_dx + gamma * inv_dx * (
            jnp.abs(ae) * 0.5 * (u - u_e) - jnp.abs(aw) * 0.5 * (u_w - u)
        )
        vn_ = 0.5 * (v + v_e)
        vs_ = 0.5 * (v_s + v_se)
        duvdy = (vn_ * 0.5 * (u + u_n) - vs_ * 0.5 * (u_s + u)) * inv_dy + (
            gamma * inv_dy
        ) * (jnp.abs(vn_) * 0.5 * (u - u_n) - jnp.abs(vs_) * 0.5 * (u_s - u))
        lap_u = (u_e - 2.0 * u + u_w) * (inv_dx * inv_dx) + (
            u_n - 2.0 * u + u_s
        ) * (inv_dy * inv_dy)
        f_val = u + dt * (inv_re * lap_u - du2dx - duvdy + g_x)

        # --- G (v-momentum), integration.c:85-91 ---------------------------
        an = 0.5 * (v + v_n)
        as_ = 0.5 * (v_s + v)
        dv2dy = (an * an - as_ * as_) * inv_dy + gamma * inv_dy * (
            jnp.abs(an) * 0.5 * (v - v_n) - jnp.abs(as_) * 0.5 * (v_s - v)
        )
        ue_ = 0.5 * (u + u_n)
        uw_ = 0.5 * (u_w + u_nw)
        duvdx = (ue_ * 0.5 * (v + v_e) - uw_ * 0.5 * (v_w + v)) * inv_dx + (
            gamma * inv_dx
        ) * (jnp.abs(ue_) * 0.5 * (v - v_e) - jnp.abs(uw_) * 0.5 * (v_w - v))
        lap_v = (v_e - 2.0 * v + v_w) * (inv_dx * inv_dx) + (
            v_n - 2.0 * v + v_s
        ) * (inv_dy * inv_dy)
        g_val = v + dt * (inv_re * lap_v - duvdx - dv2dy + g_y)

        zero = jnp.zeros(shape, f32)
        F = jnp.where(f_compute, f_val, jnp.where(f_wall, u, zero))
        G = jnp.where(g_compute, g_val, jnp.where(g_wall, v, zero))

        # --- RHS = div(F, G) / dt (main.c:116-120) -------------------------
        F_w = roll(F, 1, 0)
        G_s = roll(G, 1, 1)
        rhs = jnp.where(
            interior,
            ((F - F_w) * inv_dx + (G - G_s) * inv_dy) / dt,
            zero,
        )

        F_ref[:] = F
        G_ref[:] = G
        rhs_ref[:] = rhs

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "shape", "i_max", "j_max", "dx", "dy", "Re", "g_x", "g_y", "interpret"))
def _momentum_call(scalars, u, v, *, shape, i_max, j_max, dx, dy, Re, g_x,
                   g_y, interpret):
    kernel = _make_kernel(shape, i_max, j_max, dx, dy, Re, g_x, g_y,
                          use_pltpu_roll=not interpret)
    limit = max(16, 14 * (shape[0] * -(-shape[1] // 128) * 128 * 4 >> 20)) << 20
    out = jax.ShapeDtypeStruct(shape, jnp.float32)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=(out, out, out),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
            interpret=interpret,
        )(scalars, u, v)


def momentum_rhs(u, v, dt, gamma, params: Params):
    """(F, G, rhs) fused; drop-in for compute_fg + compute_rhs."""
    interpret = jax.default_backend() != "tpu"
    scalars = jnp.stack([
        jnp.asarray(dt, jnp.float32), jnp.asarray(gamma, jnp.float32)
    ])
    return _momentum_call(
        scalars, u.astype(jnp.float32), v.astype(jnp.float32),
        shape=params.shape, i_max=params.i_max, j_max=params.j_max,
        dx=float(params.dx), dy=float(params.dy), Re=float(params.Re),
        g_x=float(params.g_x), g_y=float(params.g_y), interpret=interpret,
    )


def usable(params: Params) -> bool:
    """Whether the fused kernel applies: TPU backend, f32, fits in VMEM.
    Obstacle domains take the jnp path (the kernel computes the RHS from
    unpinned F/G, which is wrong on obstacle faces — solver.step pins them
    between compute_fg and compute_rhs)."""
    return (
        jax.default_backend() == "tpu"
        and not params.disable_pallas
        and not params.obstacles
        and params.jnp_dtype == jnp.float32
        and fits_in_vmem(params)
    )
