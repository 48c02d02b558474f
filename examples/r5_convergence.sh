#!/bin/bash
# Round-5 convergence campaign (VERDICT r4 ask #2): run the synth32k
# quality arms TO PLATEAU (early stop on valid loss) so the two headline
# quality claims — "SigLIP dominates" and "MAE-init doesn't stack" —
# become convergence claims instead of epoch-15-budget snapshots.
#
# Flap-resilient (the tunnel drops mid-arm; observed 04:46 wedge): every
# arm runs under examples/run_watchdogged.py (kills on 600 s cputime
# stall instead of burning the wall budget), is gated on a live probe
# per ATTEMPT, retries up to 4 times, and skips itself if its artifacts
# already landed — so restarts are cheap and idempotent.
#
# Round-5 code fix this depends on: the Trainer runs eval_fn on the
# epoch an early stop triggers on (train/loop.py eval_due), so every
# arm's recall curve extends to its actual stopping epoch.
set -u
D=/tmp/synth32k
R=/root/repo/results/r5
W="python examples/run_watchdogged.py --stall-secs 600"
LOCK=/tmp/tpu.lock
cd /root/repo
mkdir -p "$R"

probe () {
  timeout 110 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024), jnp.bfloat16)
assert float((x@x)[0,0]) == 1024.0" >/dev/null 2>&1
}

wait_ready () {
  while :; do
    if pgrep -a -f pytest >/dev/null 2>&1; then sleep 20; continue; fi
    if probe; then
      pgrep -a -f pytest >/dev/null 2>&1 || return 0
    else
      date -u +%H:%M:%S >> "$R/probe_failures.log"
      sleep 60
    fi
  done
}

COMMON="--captions-dir $D --set image_path=$D/images --set vocab_file=$D/vocab.txt \
 --set epochs=60 --set lr=0.0002 --set device_data=true --set cache_images=true \
 --set early_stop_patience=8 --set eval_every=4 --no-progress --eval-retrieval"
EVALC="--captions-dir $D --set image_path=$D/images --set vocab_file=$D/vocab.txt \
 --zeroshot-dir $D/zeroshot --linear-probe-dir $D/zeroshot --max-samples 2000"

arm () {  # name preset extra_train_flags...
  local name=$1 preset=$2; shift 2
  if [ -s "$R/conv_${name}_metrics.jsonl" ]; then
    echo "=== arm $name already done; skipping ==="
    return 0
  fi
  for attempt in 1 2 3 4; do
    wait_ready
    echo "=== arm $name attempt $attempt ($(date -u +%H:%M:%S)) ==="
    rm -rf "/tmp/conv_$name"
    flock -w 43200 "$LOCK" env TPU_LOCK_HELD=1 \
      $W --timeout 5400 python -m mae_clip_tpu.cli train --preset "$preset" \
      $COMMON "$@" \
      --set logdir=/tmp/conv_$name/logs --set checkpoints=/tmp/conv_$name/ckpt \
      > "$R/conv_$name.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ] && [ -s "/tmp/conv_$name/logs/metrics.jsonl" ]; then
      echo "--- arm $name train ok; eval battery ($(date -u +%H:%M:%S)) ---"
      wait_ready
      flock -w 43200 "$LOCK" env TPU_LOCK_HELD=1 \
        $W --timeout 1200 python -m mae_clip_tpu.cli eval --preset "$preset" \
        $EVALC --checkpoint /tmp/conv_$name/ckpt \
        > "$R/conv_${name}_eval.json" 2> "$R/conv_${name}_eval.err" \
        && rm -f "$R/conv_${name}_eval.err"
      cp "/tmp/conv_$name/logs/metrics.jsonl" "$R/conv_${name}_metrics.jsonl"
      return 0
    fi
    echo "--- arm $name attempt $attempt failed rc=$rc ---"
  done
  echo "=== arm $name EXHAUSTED retries ==="
  return 1
}

arm siglip flagship_siglip

if [ ! -f "$R/.mae_pretrain_done" ]; then
  for attempt in 1 2 3 4; do
    wait_ready
    echo "=== mae pretrain attempt $attempt ($(date -u +%H:%M:%S)) ==="
    rm -rf /tmp/conv_mae
    flock -w 43200 "$LOCK" env TPU_LOCK_HELD=1 \
      $W --timeout 2400 python -m mae_clip_tpu.cli mae-pretrain \
      --preset mae_pretrain --images $D/images --set epochs=4 \
      --set device_data=true --set logdir=/tmp/conv_mae/logs \
      --set checkpoints=/tmp/conv_mae/ckpt --no-progress \
      > "$R/conv_mae_pretrain.log" 2>&1
    if [ $? -eq 0 ]; then touch "$R/.mae_pretrain_done"; break; fi
    echo "--- mae pretrain attempt $attempt failed ---"
  done
fi

[ -f "$R/.mae_pretrain_done" ] && \
  arm siglip_mae flagship_siglip --init-from-mae /tmp/conv_mae/ckpt
arm softmax flagship_tpu
echo "=== campaign done ($(date -u +%H:%M:%S)) ==="

# VERDICT r4 ask #6 at the ACTUAL quoted scale: the 100k-row staging
# breakdown (/tmp/synth100k: 50k unique images x 2 captions).
if [ -d /tmp/synth100k/images ] \
    && ! grep -q setup_timings "$R/setup_100k.full.log" 2>/dev/null; then
  for attempt in 1 2 3; do
    wait_ready
    echo "=== setup breakdown @100k rows attempt $attempt ($(date -u +%H:%M:%S)) ==="
    flock -w 43200 "$LOCK" env TPU_LOCK_HELD=1 \
      $W --stall-secs 1200 --timeout 7200 python -m mae_clip_tpu.cli train \
      --preset flagship_siglip \
      --captions-dir /tmp/synth100k --set image_path=/tmp/synth100k/images \
      --set vocab_file=/tmp/synth100k/vocab.txt \
      --set device_data=true --set cache_images=true --set epochs=1 \
      --set logdir=/tmp/r5_setup100k/logs \
      --set checkpoints=/tmp/r5_setup100k/ckpt \
      --no-progress > "$R/setup_100k.full.log" 2>&1
    echo "--- setup100k exit $? ---"
    grep -h 'setup_timings\|final_train_loss' "$R/setup_100k.full.log" || true
    grep -q setup_timings "$R/setup_100k.full.log" && break
  done
fi
