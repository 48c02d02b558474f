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
  timeout 300 python - <<'EOF'
import time, jax, jax.numpy as jnp
x = jnp.ones((8192, 8192), jnp.bfloat16)
@jax.jit
def chain(x):
    for _ in range(8):
        x = x @ x / 8192.0
    return x
y = chain(x); float(y[0, 0])
t0 = time.perf_counter()
y = chain(y); float(y[0, 0])
dt = time.perf_counter() - t0
print(f"calibration: {8*2*8192**3/dt/1e12:.1f} TFLOP/s")
EOF
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
