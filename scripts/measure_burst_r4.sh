#!/bin/bash
# Round-4 TPU measurement burst — verdict items 4 (sharded pallas_sor
# numbers), 5 (4096^2 mg bisect + partitioned workarounds), 6 (K sweep at
# 1024^2/2048^2).  Same discipline as measure_burst.sh: priority order,
# per-item timeout + log, continue on failure — a mid-burst tunnel outage
# keeps the earlier (higher-value) numbers.
#
# Usage: bash scripts/measure_burst_r4.sh [outdir]   (from the repo root)
set -u
OUT=${1:-/tmp/burst_r4}
mkdir -p "$OUT"
echo "burst-r4 start $(date '+%F %T')" | tee -a "$OUT/summary.log"

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

# --- Item 4: the sharded pallas_sor route on the real chip (1x1 mesh).
# Round-3 claim, CI-tested in interpret mode only; these are the first
# real-TPU numbers.  Comparison arms measured in the same session.
run sh_pallas_1024 2400 $B --config configs/3.in --backend sharded \
  --method pallas_sor --repeats 3
run sh_rbsor_1024 2400 $B --config configs/3.in --backend sharded \
  --method rb_sor --repeats 3
run sc_pallas_1024 2400 $B --config configs/3.in --backend pallas --repeats 3
run sh_pallas_2048 3600 $B --config configs/4.in --backend sharded \
  --method pallas_sor --repeats 2
run sh_rbsor_2048 3600 $B --config configs/4.in --backend sharded \
  --method rb_sor --repeats 2
run sc_pallas_2048 3600 $B --config configs/4.in --backend pallas --repeats 2

# --- Item 6a: K (refine-every) sweep at 1024^2 parity (fast).
run tiles_1024 3600 python scripts/run_benchmarks.py --tests 3 \
  --tile-sweep 256,512,1024,2048,4096 --runs 3 --results-dir "$OUT/tiles1024"

# --- Item 5: 4096^2 mg bisect (each variant in its own subprocess; the
# crash kills the remote worker, the next process recovers).
run repro_4096 7200 python scripts/repro_4096_mg.py --steps 8 --timeout 1200

# --- Item 5b: differently partitioned 4096^2 mg programs as workarounds.
run mg4096_gspmd 3600 $B --config configs/5.in --backend gspmd \
  --method mg --repeats 1
run mg4096_sharded 3600 $B --config configs/5.in --backend sharded \
  --method mg --repeats 1

# --- Item 6b: K sweep at 2048^2 parity (slow — ~4 min/run; 3 K x 2 runs).
run tiles_2048 7200 python scripts/run_benchmarks.py --tests 4 \
  --tile-sweep 1024,2048,4096 --runs 2 --results-dir "$OUT/tiles2048"

echo "burst-r4 done $(date '+%F %T')" | tee -a "$OUT/summary.log"
