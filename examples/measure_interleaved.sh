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

for i in $(seq 1 "$N"); do
  echo "=== pair $i ($(date -u +%H:%M:%S)) ==="
  cal 2>&1 | grep calibration | tee "$OUT/cal_${i}a.log"
  timeout 900 python bench.py 2>&1 | grep '"metric"' | tee "$OUT/headline_$i.log"
  cal 2>&1 | grep calibration | tee "$OUT/cal_${i}b.log"
done
echo "=== done ==="
