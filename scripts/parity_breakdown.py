"""Decompose the 256^2 parity headline into kernel / outer / step costs.

The end-to-end parity rate at 256^2 is ~1.5 us/sweep while the kernel-only
rate is ~0.77 us/sweep (docs/performance.md roofline table) — this script
attributes the gap with latency-differenced measurements on the real TPU:

  1. kernel-only per-sweep rate (same probe as scripts/bf16_probe.py);
  2. end-to-end per-sweep rate: difference two max_it values (the parity
     workloads are max_it-bound, so sweep count scales exactly);
  3. refinement-outer cost: difference two sor_refine_every values at
     fixed max_it (K=2048 -> 10 outer passes/step vs K=max_it -> 1);
  4. non-SOR per-step cost (momentum + BCs + projection + dt reduction):
     a max_it=64 run is almost all step overhead.

Usage: python scripts/parity_breakdown.py [--config configs/1.in]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

from navierstokes_parallel_tpu.config import Params  # noqa: E402
from navierstokes_parallel_tpu.grid import allocate_state  # noqa: E402


def solve_time(params: Params, repeats: int = 3):
    """Min-over-repeats AOT-compiled full-solve seconds + stats."""
    from navierstokes_parallel_tpu.solver import _solve_on_device

    state = allocate_state(params)
    compiled = (
        jax.jit(_solve_on_device, static_argnums=(0, 2))
        .lower(params, state, "pallas_sor")
        .compile()
    )
    out, stats = compiled(state)
    jax.device_get(out.u[1, 1])  # warm + fence
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, stats = compiled(state)
        jax.device_get(out.u[1, 1])
        best = min(best, time.perf_counter() - t0)
    return best, int(stats.total_sor_iterations), int(stats.steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/1.in")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    base = Params.from_file(args.config, dtype="float32")
    n = base.i_max

    # 0. fence latency: scalar D2H fetch of an already-materialized array.
    # Every end-to-end timing below (and bench.py's headline) includes
    # exactly one of these; over the axon tunnel it is ~30 ms, which at
    # 256^2 is a third of the whole parity number.  On directly-attached
    # TPUs it is microseconds — subtract it to estimate production time.
    import jax.numpy as jnp
    x = jnp.zeros((8, 8))
    jax.device_get(x[0, 0])
    fences = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.device_get(x[0, 0])
        fences.append(time.perf_counter() - t0)
    t_fence = min(fences)
    print(f"[0] fence latency:   {t_fence * 1e3:7.3f} ms per timed run")

    # 1. kernel-only per-sweep rate (reuses the bf16 probe's helper).
    from bf16_probe import per_sweep_rate
    kern = per_sweep_rate(base.replace(sor_refine_every=2048))
    print(f"[1] kernel-only:      {kern * 1e6:7.3f} us/sweep")

    # 2. end-to-end per-sweep rate from two max_it values.
    pA = base.replace(max_it=20000, sor_refine_every=2048)
    pB = base.replace(max_it=10000, sor_refine_every=2048)
    tA, sweepsA, stepsA = solve_time(pA, args.repeats)
    tB, sweepsB, stepsB = solve_time(pB, args.repeats)
    if stepsA != stepsB:
        print(f"warning: step counts differ ({stepsA} vs {stepsB}); "
              "per-sweep differencing includes step-cost drift",
              file=sys.stderr)
    e2e = (tA - tB) / max(1, sweepsA - sweepsB)
    print(f"[2] end-to-end:       {e2e * 1e6:7.3f} us/sweep "
          f"(tA={tA:.4f}s/{sweepsA}, tB={tB:.4f}s/{sweepsB})")

    # 3. refinement-outer cost: K=2048 vs K=max_it (1 outer pass per step).
    pC = base.replace(max_it=20000, sor_refine_every=20000)
    tC, sweepsC, stepsC = solve_time(pC, args.repeats)
    outersA = stepsA * -(-pA.max_it // pA.sor_refine_every)
    outersC = stepsC * 1
    if sweepsC == sweepsA and outersA > outersC:
        per_outer = (tA - tC) / (outersA - outersC)
        print(f"[3] outer pass:       {per_outer * 1e3:7.3f} ms/pass "
              f"({outersA - outersC} fewer passes save {tA - tC:.4f}s)")
    else:
        print(f"[3] outer pass:       n/a (sweeps {sweepsA} vs {sweepsC})")

    # 4. non-SOR step cost: nearly-zero-sweep run.
    pD = base.replace(max_it=64, sor_refine_every=64)
    tD, sweepsD, stepsD = solve_time(pD, args.repeats)
    step_cost = tD / max(1, stepsD) - sweepsD / max(1, stepsD) * kern
    print(f"[4] non-SOR step:    ~{step_cost * 1e3:7.3f} ms/step "
          f"(tD={tD:.4f}s, {stepsD} steps, {sweepsD} sweeps)")

    total_model = (sweepsA * kern
                   + (outersA - outersC) * ((tA - tC) / max(1, outersA - outersC))
                   + stepsA * step_cost)
    print(f"model: kernel {sweepsA * kern:.4f}s + outers "
          f"{tA - tC:.4f}s + steps {stepsA * step_cost:.4f}s "
          f"= {total_model:.4f}s vs measured {tA:.4f}s at {n}^2")


if __name__ == "__main__":
    main()
