"""Measure BASELINE.json config 5 at its ACTUAL scale on one chip.

One arm per process (fresh-process discipline, CLAUDE.md): a true
32,768-global-batch GradCache step — accum_steps microbatches scanned with
O(microbatch) activations, the full 32k x 32k soft-target contrastive
objective evaluated blockwise (loss_chunk_size columns, online logsumexp,
rematerialized scan bodies) on a 1-device mesh, joint MAE objective, text
features cached (the production frozen-text path). Reports pairs/s/chip,
peak HBM, and a same-window calibration.

Arms (env M32K_*):
  M32K_BATCH=32768 M32K_ACCUM=128  -> the config-5 recipe (micro 256)
  M32K_BATCH=256   M32K_ACCUM=1    -> plain-step cost anchor in the same
                                      config family (GradCache overhead =
                                      anchor_pairs_s / 32k_pairs_s)
  M32K_OPT=lamb                    -> the large-batch optimizer arm

Run arms interleaved in one window (examples/measure_32k.sh).

Usage: python examples/measure_32k.py          # needs the TPU
"""

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("M32K_BATCH", "32768"))
ACCUM = int(os.environ.get("M32K_ACCUM", "128"))
CHUNK = int(os.environ.get("M32K_CHUNK", "4096"))
OPT = os.environ.get("M32K_OPT", "adamw")
STEPS = int(os.environ.get("M32K_STEPS", "2"))   # base chain length
TILE = int(os.environ.get("M32K_TILE", "256"))   # unique rows tiled to BATCH


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mae_clip_tpu.config import large_batch_mesh_config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.parallel.mesh import create_mesh
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    cfg = large_batch_mesh_config(batch_size=BATCH, accum_steps=ACCUM,
                                  loss_chunk_size=CHUNK, optimizer=OPT)
    cfg.validate()
    text_cfg = DistilBertConfig()
    model = CLIPModel(cfg, text_config=text_cfg, attn_impl="auto")
    # 1-device mesh: routes the loss through the chunked shard_map path
    # (collectives degenerate; the blockwise evaluation is the point).
    mesh = create_mesh(len(jax.devices()), 1)

    rng = np.random.default_rng(0)
    from mae_clip_tpu.data.images import patchify_host
    block = np.stack([
        patchify_host(img, 16) for img in rng.integers(
            0, 256, size=(TILE, cfg.size, cfg.size, 3)).astype(np.uint8)])
    feats_block = rng.normal(size=(TILE, text_cfg.dim)).astype(np.float32)

    reps = BATCH // TILE
    # Ship only the 256-row block (36 MB H2D through the tunnel); tile to
    # the full batch ON DEVICE (4.6 GiB uint8 stays in HBM).
    dev_block = jnp.asarray(block)
    dev_feats = jnp.asarray(feats_block)

    # ONE tiled image tensor (4.6 GiB uint8 at 32k), SHARED by both
    # cycled batches — two copies OOM'd the 16 GiB chip. Value
    # distinctness across calls comes from the text features (salted
    # per batch) and from the train state itself, which changes every
    # step of the chain.
    tile_img = jax.jit(lambda b: jnp.tile(b, (reps, 1, 1)))
    dev_img = tile_img(dev_block)

    @jax.jit
    def tiled_text(f, salt):
        # Value-distinct text features per copy (the runtime result cache
        # hazard; bf16-representable perturbation per CLAUDE.md).
        noise = 0.01 * jnp.arange(reps, dtype=jnp.float32)[:, None, None]
        return (f[None] + noise + salt).reshape(BATCH, -1)

    valid = jnp.ones((BATCH,), bool)
    batches = [
        {"image": dev_img, "text_features": tiled_text(dev_feats, 0.0),
         "valid": valid},
        {"image": dev_img, "text_features": tiled_text(dev_feats, 0.005),
         "valid": valid},
    ]

    # Init at MICRO scale: params are batch-size independent, and a full
    # 32k un-accumulated init forward would spike activations.
    init_example = {"image": dev_block[:TILE],
                    "text_features": dev_feats,
                    "valid": jnp.ones((TILE,), bool)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), init_example)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx,
                              jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg, mesh=mesh,
                           accum_steps=cfg.accum_steps)

    t_compile = time.perf_counter()
    state, metrics = step(state, batches[0])
    loss0 = float(metrics["loss"])
    t_compile = time.perf_counter() - t_compile

    # Theil-Sen slope over chain lengths, value-fetch sync (bench.py
    # estimator; see BASELINE.md measurement protocol).
    def timed(k):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(k):
            state, metrics = step(state, batches[i % 2])
        float(metrics["loss"])
        return time.perf_counter() - t0

    timed(1)                                     # warm queue
    ks = [STEPS * m for m in range(1, 5)]
    ts = [timed(k) for k in ks]
    slopes = sorted((tj - ti) / (kj - ki)
                    for i, (ki, ti) in enumerate(zip(ks, ts))
                    for kj, tj in zip(ks[i + 1:], ts[i + 1:]))
    per_step = slopes[len(slopes) // 2]

    report = {
        "arm": f"b{BATCH}_accum{ACCUM}_{OPT}",
        "pairs_per_sec_per_chip": round(BATCH / per_step, 1),
        "sec_per_step": round(per_step, 3),
        "loss0": round(loss0, 4),
        "compile_plus_first_step_sec": round(t_compile, 1),
        "chunk": CHUNK,
    }
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            report["peak_hbm_gib"] = round(peak / 2**30, 2)
    except Exception:
        pass
    if jax.default_backend() == "tpu":
        from mae_clip_tpu.utils.calibrate import calibrate_tflops
        calib = calibrate_tflops()
        report["calib_tflops"] = round(calib, 1)
        # Per-arm floor guard (bench.py pattern; VERDICT r4 weak #5: the
        # 32k row had no machine-checkable floor). Floors from the
        # round-4 measured rows (BASELINE.md "Config 5 at its actual
        # scale"), calib-normalized to separate window drift from step
        # regressions.
        floors = {"b32768_accum128_adamw": (3617.0, 183.4),
                  "b256_accum1_adamw": (4899.0, 184.8)}
        if report["arm"] in floors and calib > 0:
            fp, fc = floors[report["arm"]]
            norm = report["pairs_per_sec_per_chip"] * (fc / calib)
            report["vs_floor"] = round(norm / fp, 3)
            if norm < 0.9 * fp:
                report["floor_warning"] = (
                    f"calib-normalized {norm:.0f} pairs/s is >10% below "
                    f"the defended {report['arm']} floor ({fp:.0f} at "
                    f"calib {fc:.0f} TF/s)")
    print(json.dumps(report))


if __name__ == "__main__":
    from mae_clip_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock():
        main()
