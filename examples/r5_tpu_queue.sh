#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 asks #1-#3, #6).
#
# Discipline (CLAUDE.md + round-4 verdict):
# * EVERY leg runs under the exclusive flock on /tmp/tpu.lock — bench.py
#   and the measure_* scripts also self-lock (utils/tpu_lock.py), so legs
#   here export TPU_LOCK_HELD=1 to make that reentrant. The driver's own
#   end-of-round bench.py waits on the same lock: no more concurrent
#   producers poisoning each other's windows.
# * Gated on a live tunnel probe (the multi-hour outage pattern) and on
#   pytest being idle (1-core host).
# * Fresh process per arm; interleave A/B arms within a window; each leg
#   self-calibrates (calib_tflops rides the JSON line).
set -u
cd /root/repo
R=/root/repo/results/r5
mkdir -p "$R"
LOCK=/tmp/tpu.lock
ENVV="PYTHONPATH=/root/repo:/root/.axon_site TPU_LOCK_HELD=1"

probe () {
  timeout 110 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024), jnp.bfloat16)
assert float((x@x)[0,0]) == 1024.0" >/dev/null 2>&1
}

wait_ready () {
  # Loop until BOTH conditions hold in the same pass: pytest idle AND a
  # live tunnel. (The round-5 first launch checked pytest only once,
  # before the probe loop — a suite started during a long outage then
  # overlapped the first leg the moment the tunnel recovered.)
  while :; do
    if pgrep -a -f pytest >/dev/null 2>&1; then sleep 20; continue; fi
    if probe; then
      pgrep -a -f pytest >/dev/null 2>&1 || return 0
    else
      date -u +%H:%M:%S >> "$R/probe_failures.log"
      sleep 60   # the tunnel FLAPS (observed up-windows ~30 min between
                 # multi-hour outages); probe often enough to catch one
    fi
  done
}

leg () {  # leg <logname> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  # Restart-safe: a leg whose log already carries a result line is done —
  # queue restarts (flapping tunnel, script updates) skip it.
  if grep -q '"metric"\|"arm"\|"mode"\|setup_timings' "$R/$name.full.log" \
      2>/dev/null; then
    return 0
  fi
  wait_ready
  echo "--- $name $(date -u +%H:%M:%S) ---" >> "$R/queue.log"
  flock -w 3600 "$LOCK" timeout "$t" env $ENVV "$@" \
    > "$R/$name.full.log" 2>&1
  grep -h '"metric"\|"arm"\|"mode"\|setup_timings' "$R/$name.full.log" \
    >> "$R/queue.log" || true
}

echo "=== r5 queue start $(date -u +%H:%M:%S) ===" >> "$R/queue.log"

# 1) Frozen/trainable A/B/A bracket (closes the round-4 classification:
#    two clean trainable readings exist; the frozen legs bracket them).
leg bench_frozen_a  900 env BENCH_TEXT_TRAINABLE=0 python bench.py
leg bench_train_b   900 env BENCH_TEXT_TRAINABLE=1 python bench.py
leg bench_frozen_c  900 env BENCH_TEXT_TRAINABLE=0 python bench.py

# 2) Floor re-baseline: 2 more headline readings (each self-calibrates;
#    together with leg 1's frozen arms -> >=5 post-fix calib readings),
#    plus ONE calibrated reference_py row (its round-2 floor rode an
#    unrecorded window calibration).
leg bench_floor_d   900 python bench.py
leg bench_floor_e   900 python bench.py
leg bench_refpy     900 env BENCH_CONFIG=reference_py python bench.py

# 3) 32k lamb retry + same-window anchor (ask #1b).
leg m32k_anchor     600 env M32K_BATCH=256 M32K_ACCUM=1 M32K_STEPS=40 \
                        python examples/measure_32k.py
leg m32k_lamb      2400 env M32K_BATCH=32768 M32K_ACCUM=128 M32K_OPT=lamb \
                        python examples/measure_32k.py

# 4) Serving shed cells (ask #1c: bounded-p99 row).
leg serving_shed   1200 python examples/measure_serving.py \
                        --concurrency 64 --secs 15

# 5) Setup breakdown (ask #6): one full synth32k staging run with the
#    overlapped decode/upload attribution (setup_timings line).
leg setup_breakdown 3600 python -m mae_clip_tpu.cli train \
    --preset flagship_siglip --captions-dir /tmp/synth32k \
    --set image_path=/tmp/synth32k/images --set vocab_file=/tmp/synth32k/vocab.txt \
    --set device_data=true --set cache_images=true --set epochs=1 \
    --set logdir=/tmp/r5_setup/logs --set checkpoints=/tmp/r5_setup/ckpt \
    --no-progress

echo "=== r5 queue phase A done $(date -u +%H:%M:%S) ===" >> "$R/queue.log"

# 6) Convergence campaign (ask #2; the long pole — each arm writes its
#    artifacts on completion, so partial progress survives a cutoff).
#    No outer flock: the gated script takes the lock PER ARM (holding it
#    here would deadlock its inner flock calls) and probe-gates itself.
bash examples/r5_convergence.sh >> "$R/queue.log" 2>&1

echo "=== r5 queue done $(date -u +%H:%M:%S) ===" >> "$R/queue.log"
