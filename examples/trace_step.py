"""Trace the flagship train step and print the per-op time breakdown.

The headless xprof path used for every step-time attribution in
BASELINE.md: jax.profiler.trace works over the remote-TPU tunnel;
utils.profiling.trace_top_ops parses the Perfetto dump without the
TensorBoard UI. Honors the bench.py env knobs (BENCH_BATCH, BENCH_CONFIG,
BENCH_CACHED_TEXT, ...) so a traced step is exactly a bench step.

Usage:
  BENCH_BATCH=512 python examples/trace_step.py [--steps 8] [--top 40] \
      [--json /tmp/ops512.json]

For a batch-sweep diff (e.g. the b512 regression): dump --json at each
batch, then compare per-op total_ms normalized by batch.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default=None,
                    help="dump the FULL aggregated op list here")
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    import bench  # the bench workload builder (repo root)
    import jax

    # Reuse bench.py's exact setup by running its main() body up to the
    # timed loop — simplest robust approach: monkeypatch its timing to a
    # traced run. Instead we re-drive via its module-level knobs.
    import numpy as np
    import jax.numpy as jnp
    from mae_clip_tpu.config import flagship_tpu_config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState
    from mae_clip_tpu.utils.profiling import trace_top_ops

    B = bench.BATCH
    cfg = flagship_tpu_config(batch_size=B)
    if bench.DTYPE:
        cfg = cfg.replace(compute_dtype=bench.DTYPE)
    if bench.LOSS:
        cfg = cfg.replace(contrastive_loss=bench.LOSS)
    text_cfg = DistilBertConfig()
    model = CLIPModel(cfg, text_config=text_cfg,
                      attn_impl=bench.ATTN or "auto")

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(B, cfg.size, cfg.size, 3)
                        ).astype(np.uint8)
    from mae_clip_tpu.data.images import patchify_host
    image_input = jnp.asarray(
        np.stack([patchify_host(im, 16) for im in imgs]))
    batch = {
        "image": image_input,
        "input_ids": jnp.asarray(rng.integers(
            0, text_cfg.vocab_size, size=(B, bench.SEQ)).astype(np.int32)),
        "attention_mask": jnp.ones((B, bench.SEQ), dtype=jnp.int32),
        "valid": jnp.ones((B,), dtype=bool),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)

    if bench.CACHED_TEXT and cfg.text_cache_enabled:
        enc = jax.jit(lambda v, i, m: model.apply(
            v, i, m, method=model.encode_text))
        batch = {"image": batch["image"],
                 "text_features": enc(variables, batch["input_ids"],
                                      batch["attention_mask"]),
                 "valid": batch["valid"]}
    batch2 = dict(batch)
    batch2["image"] = batch["image"] + 1
    batches = [batch, batch2]

    for i in range(3):                       # compile + warm
        state, metrics = step(state, batches[i % 2])
    float(metrics["loss"])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="trace_step_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, metrics = step(state, batches[i % 2])
        float(metrics["loss"])               # true barrier inside trace

    ops = trace_top_ops(trace_dir, top=10_000)
    dev = [o for o in ops if "/device:" in o.get("process", "")
           or "TPU" in o.get("process", "")] or ops
    total = sum(o["total_ms"] for o in dev)
    print(f"batch={B} steps={args.steps} "
          f"device_total={total:.1f} ms "
          f"per_step={total / args.steps:.2f} ms "
          f"pairs_per_sec={B * args.steps / total * 1e3:.0f}")
    for o in dev[:args.top]:
        print(f"{o['total_ms']:9.3f} ms  x{o['count']:<5d} {o['name'][:100]}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": B, "steps": args.steps, "ops": dev}, f)
        print("full op list ->", args.json)


if __name__ == "__main__":
    from mae_clip_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock():
        main()
