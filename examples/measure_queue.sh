#!/bin/bash
# Pending-measurement queue for the first live-TPU window (BASELINE.md
# "TPU availability note").  Each arm runs in a FRESH process (CLAUDE.md:
# in-process A/B timing is unreliable on the remote tunnel) and the 8192^3
# bf16 calibration chain runs FIRST so numbers can be trusted/normalized.
#
# Usage:  bash examples/measure_queue.sh [outdir]   (default /tmp/measure)
set -u
OUT=${1:-/tmp/measure}
mkdir -p "$OUT"
cd /root/repo

run() { # name, then command...
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout 900 "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -2 "$OUT/$name.log"
  echo "rc=$rc" >> "$OUT/$name.log"
}

# 0. Calibration: dependent bf16 8192^3 matmul chain, healthy ~186 TFLOP/s
#    (fetch-cancelled protocol; 110-120 readings were the OLD single-chain
#    protocol absorbing a tunnel fetch — see BASELINE.md correction)
#    (degraded windows have measured ~111; see CLAUDE.md).
run calibration env PYTHONPATH=/root/repo:/root/.axon_site \
  python -c "from mae_clip_tpu.utils.calibrate import main; main()"

# 1. Headline re-run (flagship, cached text, b256) x2 fresh processes.
run headline_a python bench.py
run headline_b python bench.py

# 2. HFU row.
run headline_mfu env BENCH_MFU=1 python bench.py

# 3. softmax vs SigLIP objective A/B (fresh process per arm).
run loss_softmax python bench.py
run loss_siglip env BENCH_LOSS=siglip python bench.py

# 4. reference_py sanity re-check (round-2 rows existed; cheap to refresh).
run reference_py env BENCH_CONFIG=reference_py BENCH_BATCH=256 python bench.py

echo "=== done; logs in $OUT ==="
grep -H . "$OUT"/*.log | grep -E 'metric|TFLOP|rc=' || true
