#!/bin/bash
# Round-5 TPU measurement burst — verdict items 1 (Kármán ladder 50-rung
# attempt), 2 (256^2 non-sweep attribution + re-bench), 3 (Euler-vs-AB2
# step-cost A/B), 5 (2048^2 sharded crash bisect), 6 (512^2 K sweep +
# speedup-CSV regen with shipped defaults).  Same discipline as rounds
# 3-4: priority order, per-item timeout + log, continue on failure — a
# mid-burst tunnel outage keeps the earlier (higher-value) numbers.
#
# Usage: bash scripts/measure_burst_r5.sh [outdir]   (from the repo root)
set -u
OUT=${1:-/tmp/burst_r5}
mkdir -p "$OUT"
echo "burst-r5 start $(date '+%F %T')" | tee -a "$OUT/summary.log"

run() {
  local name=$1 tmo=$2
  shift 2
  if [ -f "$OUT/$name.done" ]; then
    echo "=== $name: cached ($OUT/$name.done)" | tee -a "$OUT/summary.log"
    return
  fi
  echo "=== $name: $* (timeout ${tmo}s) $(date '+%H:%M:%S')" \
    | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    echo "    ok ($((SECONDS - t0))s): $(tail -1 "$OUT/$name.log")" \
      | tee -a "$OUT/summary.log"
    touch "$OUT/$name.done"
  else
    echo "    FAILED rc=$? ($((SECONDS - t0))s); tail:" \
      | tee -a "$OUT/summary.log"
    tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  fi
}

B="python bench.py"

# --- Item 2 evidence: attribute the 256^2 parity step (kernel vs outer
# vs momentum/BC overhead) before/after the optimization.
run parity256 2400 python scripts/parity_breakdown.py --config configs/1.in

# --- Item 6a: the missing 512^2 K-sweep rows.
run tiles512 2400 python scripts/run_benchmarks.py --tests 2 \
  --tile-sweep 256,512,1024,2048,4096 --runs 3 --results-dir "$OUT/tiles512"

# --- Item 3: Euler vs AB2 step cost, same workload, same session.
run ab2_euler_256 1200 $B --config configs/1.in --repeats 3
run ab2_ab2_256 1200 $B --config configs/1.in --time-order 2 --repeats 3
run ab2_euler_512 1200 $B --config configs/2.in --repeats 3
run ab2_ab2_512 1200 $B --config configs/2.in --time-order 2 --repeats 3

# --- Headline re-checks with the shipped auto defaults.
run auto_1024 1800 $B --config configs/3.in --repeats 3
run auto_2048 2400 $B --config configs/4.in --repeats 3

# --- Item 6b: regenerate the committed harness CSV at shipped defaults
# (reference serial numbers; 3 runs; 2048^2 row dominates ~12 min).
run speedup 4800 python scripts/run_benchmarks.py --tests 1,2,3,4 \
  --skip-serial --runs 3 --results-dir "$OUT/speedup"

# --- Item 1: one finer Kármán rung attempt (tau = 0.5 and 0.25 — two
# points make the rung usable in the h ladder via its own tau->0 limit).
# 50 cells/D crashed the worker on the mg route in round 4 AND in the
# round-5 re-attempts under both integrators; a crash here is an
# expected, recorded outcome (the worker recovers per-subprocess).
# NOTE: there is no cg fallback — obstacle domains support rb_sor/mg
# only (ops/masked.py raises for cg/fft/pallas; verified 2026-08-20),
# and masked rb_sor at 1100x205 hits max_it without converging.  The
# documented error-budget path (docs/userguide.md) is the answer at
# rungs the tunnel cannot run.
run karman50_ab2 5400 python scripts/karman_dt_study.py \
  --resolutions 50 --taus 0.5,0.25 --time-order 2 --method mg
run karman50_euler 5400 python scripts/karman_dt_study.py \
  --resolutions 50 --taus 0.5,0.25 --method mg
# Regenerate the summary rows from whatever cells survived (cache-only
# never runs a rung) + the cross-integrator reconciliation.
run karman_regen 600 python scripts/karman_dt_study.py --cache-only \
  --taus 0.5,0.25,0.125
run karman_regen_ab2 600 python scripts/karman_dt_study.py --cache-only \
  --taus 0.5,0.25,0.125 --time-order 2
run karman_continuum 120 python scripts/karman_continuum.py

# --- Item 5: the 2048^2 sharded crash bisect — LAST: each crashing
# variant kills the worker (it recovers per-subprocess, but a degraded
# tunnel can wedge; everything above must already be on disk).
run repro2048 14400 python scripts/repro_2048_sharded.py

echo "burst-r5 done $(date '+%F %T')" | tee -a "$OUT/summary.log"
