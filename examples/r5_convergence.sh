#!/bin/bash
# Round-5 convergence campaign (VERDICT r4 ask #2): run the synth32k
# quality arms TO PLATEAU (early stop on valid loss) so the two headline
# quality claims — "SigLIP dominates" and "MAE-init doesn't stack" —
# become convergence claims instead of epoch-15-budget snapshots.
#
# Round-5 code fix this depends on: the Trainer now runs eval_fn on the
# epoch an early stop triggers on (train/loop.py eval_due), so every
# arm's recall curve extends to its actual stopping epoch.
#
# Caller (examples/r5_tpu_queue.sh) holds the TPU flock and sets
# TPU_LOCK_HELD=1; running this standalone requires the session env.
set -u
D=/tmp/synth32k
R=/root/repo/results/r5
cd /root/repo
mkdir -p "$R"

COMMON="--captions-dir $D --set image_path=$D/images --set vocab_file=$D/vocab.txt \
 --set epochs=60 --set lr=0.0002 --set device_data=true --set cache_images=true \
 --set early_stop_patience=8 --set eval_every=4 --no-progress --eval-retrieval"
EVALC="--captions-dir $D --set image_path=$D/images --set vocab_file=$D/vocab.txt \
 --zeroshot-dir $D/zeroshot --linear-probe-dir $D/zeroshot --max-samples 2000"

arm () {  # name preset extra_train_flags...
  local name=$1 preset=$2; shift 2
  echo "=== arm $name ($(date -u +%H:%M:%S)) ==="
  timeout 5400 python -m mae_clip_tpu.cli train --preset "$preset" $COMMON "$@" \
    --set logdir=/tmp/conv_$name/logs --set checkpoints=/tmp/conv_$name/ckpt \
    > "$R/conv_$name.log" 2>&1
  echo "--- train exit $? ; eval battery ($(date -u +%H:%M:%S)) ---"
  timeout 900 python -m mae_clip_tpu.cli eval --preset "$preset" $EVALC \
    --checkpoint /tmp/conv_$name/ckpt \
    > "$R/conv_${name}_eval.json" 2> "$R/conv_${name}_eval.err" \
    && rm -f "$R/conv_${name}_eval.err"
  cp /tmp/conv_$name/logs/metrics.jsonl "$R/conv_${name}_metrics.jsonl" 2>/dev/null || true
}

arm siglip flagship_siglip

echo "=== mae pretrain ($(date -u +%H:%M:%S)) ==="
timeout 1800 python -m mae_clip_tpu.cli mae-pretrain --preset mae_pretrain \
  --images $D/images --set epochs=4 --set device_data=true \
  --set logdir=/tmp/conv_mae/logs --set checkpoints=/tmp/conv_mae/ckpt \
  --no-progress > "$R/conv_mae_pretrain.log" 2>&1
echo "--- pretrain exit $? ---"

arm siglip_mae flagship_siglip --init-from-mae /tmp/conv_mae/ckpt
arm softmax flagship_tpu
echo "=== campaign done ($(date -u +%H:%M:%S)) ==="

# VERDICT r4 ask #6 at the ACTUAL quoted scale: the 100k-row staging
# breakdown (BASELINE.md's "~50-70 min" setup claim was unattributed).
# /tmp/synth100k: 50k unique images x 2 captions = 100k rows; one
# cli-train epoch with device_data so the setup_timings line lands
# (decode_s / upload_s / wall_s overlap + text precompute + init).
if [ -d /tmp/synth100k/images ]; then
  echo "=== setup breakdown @100k rows ($(date -u +%H:%M:%S)) ==="
  timeout 7200 python -m mae_clip_tpu.cli train --preset flagship_siglip \
    --captions-dir /tmp/synth100k --set image_path=/tmp/synth100k/images \
    --set vocab_file=/tmp/synth100k/vocab.txt \
    --set device_data=true --set cache_images=true --set epochs=1 \
    --set logdir=/tmp/r5_setup100k/logs --set checkpoints=/tmp/r5_setup100k/ckpt \
    --no-progress > "$R/setup_100k.full.log" 2>&1
  echo "--- setup100k exit $? ---"
  grep -h 'setup_timings\|final_train_loss' "$R/setup_100k.full.log" || true
fi
