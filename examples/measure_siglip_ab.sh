#!/bin/bash
# Interleaved softmax-vs-SigLIP objective A/B (BASELINE.md "chip-rate
# drift": sequential arms are confounded by ~10-minute chip/tunnel rate
# drift, so the arms must alternate — each pair of adjacent runs shares a
# window and the PAIRED ratios are averaged).  Fresh process per run
# (CLAUDE.md), calibration chains at the ends to classify the window.
#   bash examples/measure_siglip_ab.sh [outdir] [n_pairs]
set -u
OUT=${1:-/tmp/siglip_ab}
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

cal 2>&1 | grep calibration | tee "$OUT/cal_start.log"
for i in $(seq 1 "$N"); do
  echo "=== pair $i ($(date -u +%H:%M:%S)) ==="
  timeout 900 python bench.py 2>&1 | grep '"metric"' \
    | tee "$OUT/softmax_$i.log"
  timeout 900 env BENCH_LOSS=siglip python bench.py 2>&1 | grep '"metric"' \
    | tee "$OUT/siglip_$i.log"
done
cal 2>&1 | grep calibration | tee "$OUT/cal_end.log"

python - "$OUT" <<'EOF'
import json, sys, glob, statistics
out = sys.argv[1]
def vals(pat):
    vs = []
    for f in sorted(glob.glob(f"{out}/{pat}")):
        for line in open(f):
            if '"metric"' in line:
                vs.append(json.loads(line)["value"])
    return vs
sm, sg = vals("softmax_*.log"), vals("siglip_*.log")
ratios = [b / a for a, b in zip(sm, sg)]
print(f"softmax: {sm}\nsiglip:  {sg}")
print(f"paired siglip/softmax ratios: {[round(r,3) for r in ratios]}; "
      f"median {statistics.median(ratios):.3f}")
EOF
