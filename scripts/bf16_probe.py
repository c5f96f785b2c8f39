"""Measure bfloat16 inner sweeps (Params.sor_inner_dtype) on the real TPU.

The refinement outer (ops/sor.py) re-baselines an f64 master every K sweeps,
so the inner stage's precision only affects *how much residual reduction each
chunk of K sweeps buys*, never final accuracy.  bf16 halves VMEM footprint
and HBM traffic; whether it wins depends on (a) raw sweep rate and (b) how
much earlier the inner iteration stalls on bf16 rounding.  This script
measures both, plus the headline end-to-end effect:

  1. kernel-only per-sweep rate, f32 vs bf16 (latency-differenced: time two
     sweep counts, divide the delta — cancels the tunnel's ~30 ms dispatch
     latency), at 256^2 / 1024^2 (VMEM-resident, VPU-bound) and 2048^2
     (tiled DMA route, HBM-bound; bf16 also unlocks a 2048^2 whole-grid
     kernel since the resident set halves);
  2. full benchmark workloads (configs/1.in Re=1000 cavity) end-to-end:
     wall seconds, total sweeps, sor_failures, f32 vs bf16.

Usage: python scripts/bf16_probe.py [--rate-only] [--sizes 256,1024,2048]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from navierstokes_parallel_tpu.config import Params  # noqa: E402
from navierstokes_parallel_tpu.grid import allocate_state  # noqa: E402


def fence(x):
    return jax.device_get(x)


def per_sweep_rate(params: Params, n1=64, n2=640, whole_grid=None):
    """Latency-differenced per-sweep seconds for the inner_sweeps route the
    params select (or the forced whole-grid/tiled route)."""
    from navierstokes_parallel_tpu.ops.pallas import sor_kernel

    rhs_spec = jax.ShapeDtypeStruct(params.shape, jnp.float32)
    n_spec = jax.ShapeDtypeStruct((), jnp.int32)

    if whole_grid is True:
        def f(r, n):
            ns = n.astype(jnp.int32).reshape(1)
            return sor_kernel._sweeps_call(
                ns, r.astype(jnp.dtype(params.sor_inner_dtype)),
                shape=params.shape, omega=float(params.omega),
                dx2_inv=float(1.0 / (params.dx * params.dx)),
                dy2_inv=float(1.0 / (params.dy * params.dy)),
                interpret=False, dtype=params.sor_inner_dtype,
            )[1, 1].astype(jnp.float32)
    elif whole_grid is False:
        def f(r, n):
            return sor_kernel.inner_sweeps_tiled(r, n, params)[1, 1].astype(
                jnp.float32)
    else:
        def f(r, n):
            return sor_kernel.inner_sweeps(r, n, params)[1, 1].astype(
                jnp.float32)

    compiled = jax.jit(f).lower(rhs_spec, n_spec).compile()
    rhs = np.zeros(params.shape, np.float32)
    rhs[params.i_max // 2, params.j_max // 2] = 1.0

    fence(compiled(rhs, np.int32(n1)))
    fence(compiled(rhs, np.int32(n2)))

    def timed(n):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            fence(compiled(rhs, np.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(1e-9, (timed(n2) - timed(n1)) / float(n2 - n1))


def endtoend(params: Params):
    """Full solve wall seconds + stats (AOT-compiled, fenced)."""
    from navierstokes_parallel_tpu.solver import _solve_on_device

    state = allocate_state(params)
    compiled = (
        jax.jit(_solve_on_device, static_argnums=(0, 2))
        .lower(params, state, "pallas_sor")
        .compile()
    )
    out, stats = compiled(state)
    fence(out.u[1, 1])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out, stats = compiled(state)
        fence(out.u[1, 1])
        best = min(best, time.perf_counter() - t0)
    return best, int(stats.total_sor_iterations), int(stats.sor_failures), \
        int(stats.steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,1024")
    ap.add_argument("--rate-only", action="store_true")
    ap.add_argument("--e2e-config", default="configs/1.in")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    for n in [int(s) for s in args.sizes.split(",")]:
        base = Params(i_max=n, j_max=n, Re=1000.0, T=0.01, epsilon=1e-4,
                      max_it=20000, dtype="float32")
        for dt in ("float32", "bfloat16"):
            p = base.replace(sor_inner_dtype=dt)
            from navierstokes_parallel_tpu.ops.pallas.sor_kernel import \
                fits_in_vmem
            whole = fits_in_vmem(p, itemsize=jnp.dtype(dt).itemsize)
            try:
                r = per_sweep_rate(p, whole_grid=True if whole else None)
                route = "whole-grid" if whole else "auto(>VMEM)"
                print(f"{n}^2 {dt:<9} {route:<12} {r * 1e6:8.2f} us/sweep")
            except Exception as e:
                print(f"{n}^2 {dt:<9} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")
            if not whole:
                try:
                    r = per_sweep_rate(p, whole_grid=False)
                    print(f"{n}^2 {dt:<9} {'tiled-dma':<12} "
                          f"{r * 1e6:8.2f} us/sweep")
                except Exception as e:
                    print(f"{n}^2 {dt:<9} tiled FAILED: {type(e).__name__}: "
                          f"{str(e)[:200]}")

    if args.rate_only:
        return

    base = Params.from_file(args.e2e_config, dtype="float32")
    for dt in ("float32", "bfloat16"):
        p = base.replace(sor_inner_dtype=dt)
        try:
            wall, sweeps, fails, steps = endtoend(p)
            print(f"e2e {base.i_max}^2 {dt:<9} wall={wall:8.3f}s "
                  f"sweeps={sweeps} steps={steps} sor_failures={fails}")
        except Exception as e:
            print(f"e2e {base.i_max}^2 {dt:<9} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
