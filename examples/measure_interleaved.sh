#!/bin/bash
# Interleaved calibration <-> headline measurement (fresh process per run).
# The chip/tunnel rate varies across minutes (measured same-queue spread
# 7.7k -> 13.5k pairs/s with calibration 119.6 vs healthy 164 TFLOP/s), so
# each headline number is only interpretable next to a calibration chain
# measured IMMEDIATELY before/after it.  Usage:
#   bash examples/measure_interleaved.sh [outdir] [n_pairs]
set -u
OUT=${1:-/tmp/measure_interleaved}
N=${2:-3}
mkdir -p "$OUT"
cd /root/repo

cal() {
  # Fetch-cancelled median-of-slopes chain (utils/calibrate.py): the
  # round-3 methodology fix -- single-chain timings absorbed 30-80 ms of
  # tunnel fetch latency and misread a healthy chip (~186 TFLOP/s
  # sustained) as degraded (110-120).
  timeout 300 env PYTHONPATH=/root/repo:/root/.axon_site \
    python -c "from mae_clip_tpu.utils.calibrate import main; main()"
}

for i in $(seq 1 "$N"); do
  echo "=== pair $i ($(date -u +%H:%M:%S)) ==="
  cal 2>&1 | grep calibration | tee "$OUT/cal_${i}a.log"
  timeout 900 python bench.py 2>&1 | grep '"metric"' | tee "$OUT/headline_$i.log"
  cal 2>&1 | grep calibration | tee "$OUT/cal_${i}b.log"
done
echo "=== done ==="
