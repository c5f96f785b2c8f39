"""Timing / profiling utilities.

The reference's observability is a host clock() bracket around the SOR call
whose cumulative seconds go to stderr (main.c:84-125,153) — that protocol
lives in cli.py.  This module adds what the reference lacked: reliable
device fencing on remote platforms, MLUPS accounting, and jax.profiler
trace capture (the Nsight analogue README.md:50 recommends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def device_fence(state_or_array) -> float:
    """Hard synchronization point.  On remote platforms (axon tunnel)
    `jax.block_until_ready` returns before execution finishes; a scalar D2H
    fetch is the only reliable fence.  Returns the fetched scalar."""
    arr = getattr(state_or_array, "u", state_or_array)
    idx = tuple(s // 2 for s in arr.shape) if arr.ndim else ()
    return float(arr[idx]) if arr.ndim else float(arr)


class Timer:
    """Wall timer with a device fence on stop."""

    def __init__(self):
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, fence_on=None) -> float:
        if fence_on is not None:
            device_fence(fence_on)
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed

    def __exit__(self, *exc):
        if self._t0 is not None and self.elapsed == 0.0:
            self.elapsed = time.perf_counter() - self._t0
        return False


def mlups(total_sweeps: int, i_max: int, j_max: int, seconds: float) -> float:
    """Million lattice-site updates per second of the SOR solve — the
    north-star throughput metric (BASELINE.md)."""
    if seconds <= 0:
        return float("inf")
    return total_sweeps * i_max * j_max / seconds / 1e6


# Minimum HBM traffic of one fused red-black sweep on a non-VMEM-resident
# grid: read delta + rhs, write delta = 3 arrays x 4 bytes per cell.  The
# VMEM-resident kernels beat this bound by construction (HBM is touched
# twice per K sweeps), so achieved/roofline > 100% there measures exactly
# the residency win.
SWEEP_HBM_BYTES_PER_CELL = 12


def hbm_bandwidth_probe(repeats: int = 3, mib: int = 256) -> float:
    """Measured streaming HBM bandwidth in bytes/s.

    Times `R` fused-free passes of y = y + 1 over a `mib`-MiB array (each
    loop iteration reads + writes HBM; the fori_loop boundary prevents XLA
    from collapsing them into one pass) at two different R and differences
    the timings — which cancels the dispatch/fence latency exactly (the
    tunnel's D2H fence alone can cost tens of ms, far more than a single
    pass at full bandwidth)."""
    import jax.numpy as jnp
    from jax import lax

    n_rows = (mib << 20) // (4 * 16384)
    x = jnp.zeros((n_rows, 16384), jnp.float32)
    f = jax.jit(lambda a, R: lax.fori_loop(0, R, lambda i, y: y + 1.0, a))
    device_fence(f(x, 4))  # compile + warm

    def timed(R):
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            y = f(x, R)
            device_fence(y)
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = 16, 80
    t1, t2 = timed(r1), timed(r2)
    if t2 <= t1:  # timing noise swamped the delta; fall back to one-shot
        return 2.0 * x.size * 4 * r2 / t2
    return (r2 - r1) * 2.0 * x.size * 4 / (t2 - t1)


def sweep_roofline_mlups(bandwidth_bytes_per_s: float) -> float:
    """HBM-roofline MLUPS for one red-black sweep (BASELINE.md north star:
    >= 80% of this at 128^2)."""
    return bandwidth_bytes_per_s / SWEEP_HBM_BYTES_PER_CELL / 1e6


# VPU issue slots per CELL of one full red-black sweep of the VMEM-resident
# kernel (ops/pallas/sor_kernel.py::half_sweep, counted from the code —
# the kernel computes every element and masks, so the per-CELL cost is the
# per-element cost).  Per half-sweep per element, FMA-FUSED scheduling
# (the probe below counts one FMA chain link as one slot, so the model
# must count the kernel's ops the same way):
#   4 rolls (lane/sublane shifts — one vector op each on the VPU)
#   5 for nb    (add r1+r2, add r3+r4, mul *dx2, fma *dy2+, fma d*self+)
#   3 for d_new ((nb-rhs) sub, coef* mul, fma d*(1-omega)+)
#   1 select (where)
# = 13 slots; a full sweep is two half-sweeps = 26 slots/cell.
# History: the round-4 model used a non-fused count of 32, which the
# round-5 measurements FALSIFIED as a bound — the 1024^2 end-to-end
# parity run sustained 74,658 MLUPS = 110% of the 32-slot "roofline"
# (fence-differenced bench, 2026-08-20), so XLA/Mosaic demonstrably
# schedules the mul+add pairs as single FMA slots.  With 26 the same
# measurement sits at 89% and the 256^2 kernel-only probe at ~110%
# (an issue-slot model is ~±10% honest at best — rolls may cost more
# than one slot, selects may fuse away).
SWEEP_VPU_SLOTS_PER_CELL = 26


def vpu_throughput_probe(repeats: int = 3, n: int = 1024) -> float:
    """Measured sustained VPU throughput in ISSUE SLOTS/s (1 slot = one
    elementwise vector op: fma, add, mul, select, roll).

    Times R iterations of a fori_loop whose body issues 8 independent
    128-deep FMA chains over (n, n) f32 arrays at two different R,
    differenced (cancels dispatch/fence latency exactly like
    hbm_bandwidth_probe).  XLA fuses each loop body into one kernel, so
    HBM is touched once per body while 1024 FMAs/element execute in
    registers — >98% compute-bound at the measured bandwidth; the 8
    independent chains give the VPU pipelines ILP to stay full despite
    each chain's serial dependency."""
    import jax.numpy as jnp
    from jax import lax

    depth = 128
    xs = [jnp.full((n, n), 1.0 + 1e-7 * k, jnp.float32) for k in range(8)]
    c = jnp.float32(0.9999999)
    d = jnp.float32(1e-9)

    def body(i, ys):
        for _ in range(depth):
            ys = tuple(y * c + d for y in ys)
        return ys

    f = jax.jit(lambda ys, R: lax.fori_loop(0, R, body, ys))
    device_fence(f(tuple(xs), 2)[0])  # compile + warm

    def timed(R):
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            ys = f(tuple(xs), R)
            device_fence(ys[0])
            best = min(best, time.perf_counter() - t0)
        return best

    # Loop counts sized so the DIFFERENCED time is ~0.5 s on v5e (~2.1
    # Tslots/s measured): the tunnel's scalar fence jitters by ~30 ms, so
    # a differenced window must be >> that or the probe returns noise
    # (the first cut used r2-r1=16 -> 0.3 ms of work and "measured"
    # 15 Tslots/s, 7x over hardware peak).
    r1, r2 = 100, 1100
    t1, t2 = timed(r1), timed(r2)
    slots_per_iter = 8 * depth * n * n
    if t2 <= t1:
        return slots_per_iter * r2 / t2
    return (r2 - r1) * slots_per_iter / (t2 - t1)


def sweep_vpu_roofline_mlups(vpu_slots_per_s: float) -> float:
    """VPU-roofline MLUPS for one red-black sweep of the VMEM-resident
    kernel: what a perfect-occupancy VPU executing exactly the kernel's
    op mix (SWEEP_VPU_SLOTS_PER_CELL) would reach.  The BINDING roofline
    for a VMEM-resident workload is min(this, the HBM roofline); for the
    K-sweep kernels HBM is touched twice per K sweeps, so this is the
    binding bound (docs/performance.md 'Roofline accounting')."""
    return vpu_slots_per_s / SWEEP_VPU_SLOTS_PER_CELL / 1e6


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/nsp_trace"):
    """Capture a jax.profiler trace around a block (view with TensorBoard
    or xprof) — the deep-profiling path the reference delegates to Nsight."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
