#!/bin/bash
set -u
cd /root/repo
R=/root/repo/results/r4
mkdir -p "$R"
# Gate on tunnel recovery (watcher writes /tmp/tunnel_up) and on the test
# suite being done (CPU contention corrupts TPU timings; CLAUDE.md).
while [ ! -f /tmp/tunnel_up ]; do sleep 20; done
while pgrep -a -f pytest >/dev/null 2>&1; do sleep 20; done
echo "=== queue start $(date -u +%H:%M:%S) ===" > "$R/queue.log"

# 1) VERDICT ask #3: trainable-text dual-tower vs frozen headline,
#    interleaved, fresh process each, self-calibrating.
# (advisor fix, round 4: bench legs now carry PYTHONPATH explicitly so a
# detached launch without the session env still registers the TPU.)
for arm in 0 1; do
  echo "--- bench TEXT_TRAINABLE=$arm $(date -u +%H:%M:%S) ---" >> "$R/queue.log"
  timeout 900 env PYTHONPATH=/root/repo:/root/.axon_site BENCH_TEXT_TRAINABLE=$arm \
    python bench.py > "$R/bench_text$arm.full.log" 2>&1
  grep '"metric"' "$R/bench_text$arm.full.log" >> "$R/queue.log"
done
# second FROZEN leg closes the window classification (advisor fix,
# round 4: this leg ran TEXT_TRAINABLE=1 — a trainable repeat — so the
# frozen A/B/A bracket was never closed; r5_tpu_queue.sh re-runs it).
echo "--- bench TEXT_TRAINABLE=0 leg2 $(date -u +%H:%M:%S) ---" >> "$R/queue.log"
timeout 900 env PYTHONPATH=/root/repo:/root/.axon_site BENCH_TEXT_TRAINABLE=0 \
  python bench.py > "$R/bench_text0b.full.log" 2>&1
grep '"metric"' "$R/bench_text0b.full.log" >> "$R/queue.log"

# 2) VERDICT ask #2 residual: the lamb 32k arm (hung in the round-4
#    outage window), anchored for window classification.
echo "--- 32k lamb retry $(date -u +%H:%M:%S) ---" >> "$R/queue.log"
timeout 600 env PYTHONPATH=/root/repo:/root/.axon_site \
  M32K_BATCH=256 M32K_ACCUM=1 M32K_STEPS=40 \
  python examples/measure_32k.py > "$R/m32k_anchor.full.log" 2>&1
grep '"arm"' "$R/m32k_anchor.full.log" >> "$R/queue.log"
timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
  M32K_BATCH=32768 M32K_ACCUM=128 M32K_OPT=lamb \
  python examples/measure_32k.py > "$R/m32k_lamb.full.log" 2>&1
grep '"arm"' "$R/m32k_lamb.full.log" >> "$R/queue.log"

# 3) VERDICT ask #4: convergence campaign (longest; runs as far as the
#    round allows — each arm writes its artifacts on completion).
bash examples/run_convergence.sh >> "$R/queue.log" 2>&1
echo "=== queue done $(date -u +%H:%M:%S) ===" >> "$R/queue.log"
