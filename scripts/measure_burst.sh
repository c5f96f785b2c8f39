#!/bin/bash
# TPU measurement burst — the round-3 pending checklist (CLAUDE.md), in
# priority order.  The axon tunnel goes fully dark for hours at a time
# (three outages observed), so every item is independent: its own timeout,
# its own log, continue on failure.  A mid-burst outage still leaves the
# earlier (higher-value) numbers on disk.
#
# Usage: bash scripts/measure_burst.sh [outdir]   (run from the repo root —
# the DCT route race persists to ./.nsp_route_cache.json)
set -u
OUT=${1:-/tmp/burst}
mkdir -p "$OUT"
echo "burst start $(date '+%F %T')" | tee -a "$OUT/summary.log"

run() {
  local name=$1 tmo=$2
  shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date '+%H:%M:%S')" \
    | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    echo "    ok ($((SECONDS - t0))s): $(tail -1 "$OUT/$name.log")" \
      | tee -a "$OUT/summary.log"
  else
    echo "    FAILED rc=$? ($((SECONDS - t0))s); tail:" \
      | tee -a "$OUT/summary.log"
    tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  fi
}

B="python bench.py"

# 1. 2048^2 fft headline + first rfft-vs-matmul route race at this size
#    (persists to .nsp_route_cache.json; prior matmul-only number: 2.05 s).
run bench_fft_2048 1800 $B --config configs/4.in --method fft --repeats 3

# 2. Component attribution at 2048^2: matmul/rfft/precision-ladder ms per
#    solve, f64 vs compensated outer ms per pass, momentum ms.
run breakdown_fft_2048 2400 python scripts/step_breakdown.py \
  --config configs/4.in --method fft

# 3-6. A/Bs at 2048^2 fft: compensated outer, chained solves, MXU precision.
run bench_fft_2048_comp 1200 $B --config configs/4.in --method fft \
  --outer compensated --repeats 3
run bench_fft_2048_s2 1200 $B --config configs/4.in --method fft \
  --fft-solves 2 --repeats 3
run bench_fft_2048_s3 1200 $B --config configs/4.in --method fft \
  --fft-solves 3 --repeats 3
run bench_fft_2048_phigh 1200 $B --config configs/4.in --method fft \
  --fft-precision high --repeats 3
run bench_fft_2048_pdef 1200 $B --config configs/4.in --method fft \
  --fft-precision default --repeats 3

# 7. Smaller fft sizes (route races persist; prior: 0.031 / 0.080 s).
run bench_fft_512 900 $B --config configs/2.in --method fft --repeats 3
run bench_fft_1024 900 $B --config configs/3.in --method fft --repeats 3

# 8. 4096^2 flagship: route race + min-over-3 (prior one-shot 41.87 s),
#    then the compensated-outer A/B at the size where the outer matters most.
run bench_fft_4096 3600 $B --config configs/5.in --method fft --repeats 3
run bench_fft_4096_comp 3600 $B --config configs/5.in --method fft \
  --outer compensated --repeats 3

# 8b. 4096^2 component attribution, fft only (transforms/outer/momentum;
#     --steps 2 keeps the end-to-end leg to 1-2-step dispatches — longer
#     4096^2 dispatches crash the remote worker, CLAUDE.md).
run breakdown_fft_4096 3600 python scripts/step_breakdown.py \
  --config configs/5.in --method fft --steps 2

# 9. Sharded-fft overhead on the single real chip (1x1 mesh; mg's measured
#    overhead at this size is 1.06-1.14x).
run bench_sharded_fft_512 1200 $B --config configs/2.in --backend sharded \
  --method fft --repeats 3
run bench_gspmd_fft_512 1200 $B --config configs/2.in --backend gspmd \
  --method fft --repeats 3

# 10. mg at 2048^2 (sharded-auto flip decision: fft vs mg) + its
#     compensated-outer A/B, + mg component attribution.
run bench_mg_2048 2400 $B --config configs/4.in --method mg --repeats 3
run bench_mg_2048_comp 2400 $B --config configs/4.in --method mg \
  --outer compensated --repeats 3
run breakdown_mg_2048 2400 python scripts/step_breakdown.py \
  --config configs/4.in --method mg

# 11. Chained V-cycles per f64 outer pass (mg analogue of --fft-solves;
#     CPU-measured cycle cost: +10-16% cycles, outer passes /2 at c=2, /3
#     at c=3 — a net win wherever the emulated f64 outer rivals the cycle).
run bench_mg_2048_c2 2400 $B --config configs/4.in --method mg \
  --mg-cycles 2 --repeats 3
run bench_mg_2048_c3 2400 $B --config configs/4.in --method mg \
  --mg-cycles 3 --repeats 3

# 12. Beyond-reference channel model on the real chip (fast; artifact row
#     for docs/performance.md).
run bench_channel_mg 900 $B --config configs/channel.in --method mg \
  --repeats 3

# 13. Rayleigh-Benard validation artifacts (onset growth rates + steady
#     Nu(Ra) branch in the critical box + Ouertatani square-cavity Nu).
run rb_onset 2400 python scripts/validate_rb.py --mode onset --n 64 \
  --platform axon
run rb_branch 3600 python scripts/validate_rb.py --mode branch --n 48 \
  --platform axon
run rb_nusselt 3600 python scripts/validate_rb.py --mode nusselt \
  --ra 1e4 1e5 --n 128 --platform axon

echo "burst done $(date '+%F %T')" | tee -a "$OUT/summary.log"
