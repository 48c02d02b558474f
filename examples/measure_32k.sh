#!/bin/bash
# BASELINE.json config 5 at its ACTUAL scale: interleaved arms of
# examples/measure_32k.py (fresh process per arm, CLAUDE.md). Arms:
#   anchor  - b256 accum1 adamw  : plain-step cost anchor, same config
#                                  family (GradCache overhead = anchor
#                                  pairs/s / 32k pairs/s)
#   big     - b32768 accum128    : the config-5 recipe (micro 256,
#                                  chunked 4096-col online-logsumexp loss)
#   lamb    - big + optimizer=lamb (the large-batch standard)
# Each measure_32k.py run self-calibrates at the end (calib_tflops key),
# so adjacent arms share a classified window.
#   bash examples/measure_32k.sh [outdir] [n_pairs]
set -u
OUT=${1:-/tmp/measure_32k}
N=${2:-2}
mkdir -p "$OUT"
cd /root/repo

run() {   # run <name> <env...>
  local name=$1; shift
  # Full output to .full.log (a failed arm's traceback must survive);
  # the one-line result to .log for the summary.
  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site "$@" \
    python examples/measure_32k.py > "$OUT/${name}.full.log" 2>&1
  grep '"arm"' "$OUT/${name}.full.log" | tee "$OUT/${name}.log"
}

for i in $(seq 1 "$N"); do
  echo "=== round $i ($(date -u +%H:%M:%S)) ==="
  run "anchor_$i" M32K_BATCH=256 M32K_ACCUM=1 M32K_STEPS=40
  run "big_$i"    M32K_BATCH=32768 M32K_ACCUM=128
  run "lamb_$i"   M32K_BATCH=32768 M32K_ACCUM=128 M32K_OPT=lamb
done
echo "=== done ==="
