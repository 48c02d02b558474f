"""Benchmark: flagship train-step throughput (image-text pairs/sec/chip).

Workload: the flagship TPU recipe — ViT-S/16 image tower with joint MAE
objective (75% masking, FLIP-style shared visible pass), full DistilBERT
(6L/768) text tower, projection heads, soft-target symmetric InfoNCE +
masked-pixel MSE, AdamW — bf16 compute, Pallas flash attention, one full
jitted train step (fwd+bwd+update, donated state) per measurement.

Baseline: the reference publishes no numbers (BASELINE.md), so vs_baseline
is measured against the reference recipe's throughput on the hardware
available to it here: the PyTorch reference composite (ResNet50+DistilBERT,
batch 8, fwd+bwd+AdamW) on this host's CPU = 2.274 pairs/sec (see
BASELINE.md "Measured baselines").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_REFERENCE_PAIRS_PER_SEC = 2.274  # measured; see BASELINE.md

import os

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
SEQ = int(os.environ.get("BENCH_SEQ", "64"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
ATTN = os.environ.get("BENCH_ATTN", "")  # empty = shape-aware auto


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mae_clip_tpu.config import flagship_tpu_config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    on_tpu = jax.default_backend() == "tpu"
    cfg = flagship_tpu_config(batch_size=BATCH)
    text_cfg = DistilBertConfig()
    attn = ATTN or "auto"
    model = CLIPModel(cfg, text_config=text_cfg, attn_impl=attn)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(
            size=(BATCH, cfg.size, cfg.size, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(
            0, text_cfg.vocab_size, size=(BATCH, SEQ)).astype(np.int32)),
        "attention_mask": jnp.ones((BATCH, SEQ), dtype=jnp.int32),
        "valid": jnp.ones((BATCH,), dtype=bool),
    }

    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)

    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    pairs_per_sec = STEPS * BATCH / dt
    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "image-text pairs/sec/chip (ViT-S/16+MAE + DistilBERT, "
                "bf16, batch 256, fwd+bwd+AdamW)",
        "vs_baseline": round(
            pairs_per_sec / TORCH_CPU_REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
