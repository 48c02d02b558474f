"""Standalone MAE pretraining: image-only objective, loader, transfer.

The reference names MAE but never ships it (SURVEY.md; the only trace is
the commented-out ViT tower, reference modules.py:20-26). This framework
makes the MAE-paper workflow (arXiv:2111.06377) first-class: image-only
pretraining (``train.loop.make_mae_pretrain_step``) followed by encoder
transfer into a CLIP tower (``interop.transfer``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mae_clip_tpu.config import MAEConfig, mae_pretrain_config
from mae_clip_tpu.models.clip import CLIPModel, mae_vit_for
from mae_clip_tpu.models.vit import ViTConfig
from mae_clip_tpu.train.loop import (Trainer, make_mae_eval_step,
                                     make_mae_pretrain_step)
from mae_clip_tpu.train.optim import make_optimizer
from mae_clip_tpu.train.state import TrainState

TINY_VIT = ViTConfig(image_size=32, patch_size=8, dim=32, depth=1,
                     n_heads=4, pos_embed="sincos")


def tiny_cfg(**kw):
    return mae_pretrain_config(
        batch_size=4, size=32, compute_dtype="float32", gelu_impl=None,
        image_heads=None,
        mae=MAEConfig(enabled=True, mask_ratio=0.75, decoder_dim=16,
                      decoder_depth=1, decoder_heads=2), **kw)


def make_model_and_state(cfg):
    model = mae_vit_for(cfg, vit_config=TINY_VIT)
    imgs = jnp.zeros((cfg.batch_size, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs,
                           jax.random.PRNGKey(1))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    return model, tx, state


def test_pretrain_step_loss_decreases():
    cfg = tiny_cfg()
    model, tx, state = make_model_and_state(cfg)
    step = make_mae_pretrain_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(
        rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
        "valid": jnp.ones((4,), bool)}
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert metrics["mae_loss"] == metrics["loss"]


def test_pad_rows_do_not_affect_loss_or_grads():
    """Invalid (ragged-tail pad) rows must contribute nothing."""
    cfg = tiny_cfg()
    model, tx, state = make_model_and_state(cfg)
    eval_step = make_mae_eval_step(model, cfg)
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    valid = np.array([True, True, True, False])
    base = {"image": jnp.asarray(imgs), "valid": jnp.asarray(valid)}
    poked = np.array(imgs)
    poked[3] += 100.0
    other = {"image": jnp.asarray(poked), "valid": jnp.asarray(valid)}
    l1 = float(eval_step(state, base)["loss"])
    l2 = float(eval_step(state, other)["loss"])
    assert l1 == l2

    step = make_mae_pretrain_step(model, tx, cfg)
    s1, m1 = step(state, base)
    # Rebuild state (donated) and step on the poked batch: same loss.
    _, _, state2 = make_model_and_state(cfg)
    s2, m2 = step(state2, other)
    assert float(m1["loss"]) == float(m2["loss"])


def test_transfer_into_joint_clip_tower():
    """MAE-enabled CLIP tower: every pretrained leaf transfers (decoder
    included) and the tower params become bit-identical."""
    from mae_clip_tpu.interop.transfer import load_mae_encoder_into_clip

    cfg = tiny_cfg()
    model, _, state = make_model_and_state(cfg)

    from mae_clip_tpu.models.distilbert import DistilBertConfig
    clip = CLIPModel(cfg, text_config=DistilBertConfig(
        vocab_size=64, dim=32, n_layers=1, n_heads=4, hidden_dim=64,
        max_position_embeddings=16), vit_config=TINY_VIT)
    batch = {"image": jnp.zeros((2, 32, 32, 3), jnp.float32),
             "input_ids": jnp.zeros((2, 8), jnp.int32),
             "attention_mask": jnp.ones((2, 8), jnp.int32)}
    cvars = clip.init(jax.random.PRNGKey(3), batch,
                      mask_rng=jax.random.PRNGKey(4))

    new_params, transferred, skipped = load_mae_encoder_into_clip(
        cvars["params"], state.params)
    assert skipped == []
    flat_src = jax.tree_util.tree_leaves(state.params)
    flat_dst = jax.tree_util.tree_leaves(new_params["image_encoder"])
    assert len(transferred) == len(flat_src) == len(flat_dst)
    for a, b in zip(flat_src, flat_dst):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Untouched scopes keep their init values.
    t0 = jax.tree_util.tree_leaves(cvars["params"]["text_encoder"])
    t1 = jax.tree_util.tree_leaves(new_params["text_encoder"])
    np.testing.assert_array_equal(np.asarray(t0[0]), np.asarray(t1[0]))


def test_transfer_into_plain_vit_tower_skips_decoder():
    """MAE-disabled CLIP tower (ViTEncoder): encoder leaves transfer,
    decoder leaves report as skipped."""
    from mae_clip_tpu.interop.transfer import load_mae_encoder_into_clip
    from mae_clip_tpu.models.distilbert import DistilBertConfig

    cfg = tiny_cfg()
    _, _, state = make_model_and_state(cfg)

    clip_cfg = cfg.replace(mae=MAEConfig(enabled=False))
    clip = CLIPModel(clip_cfg, text_config=DistilBertConfig(
        vocab_size=64, dim=32, n_layers=1, n_heads=4, hidden_dim=64,
        max_position_embeddings=16), vit_config=TINY_VIT)
    batch = {"image": jnp.zeros((2, 32, 32, 3), jnp.float32),
             "input_ids": jnp.zeros((2, 8), jnp.int32),
             "attention_mask": jnp.ones((2, 8), jnp.int32)}
    cvars = clip.init(jax.random.PRNGKey(3), batch)

    new_params, transferred, skipped = load_mae_encoder_into_clip(
        cvars["params"], state.params)
    assert any(p.startswith("patch_embed") for p in transferred)
    assert any(p.startswith("block_0") for p in transferred)
    assert "cls_token" in transferred and "norm/scale" in transferred
    assert all(p.split("/")[0].startswith(("decoder", "mask_token"))
               for p in skipped)
    np.testing.assert_array_equal(
        np.asarray(new_params["image_encoder"]["cls_token"]),
        np.asarray(state.params["cls_token"]))


def test_trainer_objective_mae_fit(tmp_path):
    cfg = tiny_cfg(epochs=2)
    model, tx, state = make_model_and_state(cfg)
    trainer = Trainer(cfg, model, state.params, tx=tx, objective="mae")
    rng = np.random.default_rng(2)
    images = rng.normal(size=(10, 32, 32, 3)).astype(np.float32)

    from mae_clip_tpu.data.pipeline import ImageDataset, make_image_loader
    ds = ImageDataset([f"{i}.png" for i in range(10)], size=32)

    def loader(epoch=0):
        return make_image_loader(ds, cfg.batch_size, shuffle=True,
                                 seed=epoch, images=images, num_threads=1)

    history = trainer.fit(loader, lambda: loader(), epochs=2)
    assert len(history["train_loss"]) == 2
    assert np.isfinite(history["train_loss"]).all()
    assert np.isfinite(history["valid_loss"]).all()


def test_image_dataset_and_loader(tmp_path):
    import cv2
    rng = np.random.default_rng(3)
    for i in range(5):
        img = rng.integers(0, 255, size=(20, 24, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"img_{i}.png"), img)
    (tmp_path / "notes.txt").write_text("not an image")

    from mae_clip_tpu.data.pipeline import ImageDataset, make_image_loader
    ds = ImageDataset.from_directory(str(tmp_path), size=16)
    assert len(ds) == 5
    assert ds.image_filenames == sorted(ds.image_filenames)

    batches = list(make_image_loader(ds, batch_size=2, num_threads=1))
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (2, 16, 16, 3)
        assert b["image"].dtype == np.float32
    assert batches[-1]["valid"].tolist() == [True, False]
    assert np.all(batches[-1]["image"][1] == 0)

    # Pre-patchified uint8 path (the ViT fast path).
    ds8 = ImageDataset.from_directory(str(tmp_path), size=16, raw_uint8=True,
                                      patchify_size=8)
    b = next(make_image_loader(ds8, batch_size=5, num_threads=1))
    assert b["image"].shape == (5, 4, 8 * 8 * 3)
    assert b["image"].dtype == np.uint8


def test_cli_mae_pretrain_and_transfer(tmp_path):
    """End-to-end: mae-pretrain CLI run -> train --init-from-mae ingests
    its checkpoint."""
    import cv2

    from mae_clip_tpu import cli

    rng = np.random.default_rng(4)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(6):
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))

    run_dir = tmp_path / "run"
    cli.main([
        "mae-pretrain", "--images", str(img_dir),
        "--val-fraction", "0.34",
        "--set", "batch_size=8", "--set", "epochs=1", "--set", "size=32",
        "--set", "compute_dtype=float32", "--set", "gelu_impl=null",
        "--set", "image_heads=null",
        "--set", "mae.decoder_dim=16", "--set", "mae.decoder_depth=1",
        "--set", "mae.decoder_heads=2",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    assert any(d.name.isdigit() for d in run_dir.iterdir())

    from mae_clip_tpu.train.checkpoint import load_variables
    from mae_clip_tpu.config import mae_pretrain_config
    cfg = mae_pretrain_config(batch_size=8, size=32,
                              compute_dtype="float32")
    restored = load_variables(str(run_dir), cfg)
    assert "patch_embed" in restored["params"]
    assert "decoder_pred" in restored["params"]

    # timm-ViT .pth export of the pretrained encoder (torch-facing exit).
    import torch
    out_pth = tmp_path / "encoder.pth"
    cli.main([
        "export-pth", "--checkpoint", str(run_dir), str(out_pth),
        "--timm-vit",
        "--set", "model_name=vit_s16", "--set", "image_embedding=384",
        "--set", "size=32", "--set", "compute_dtype=float32",
    ])
    sd = torch.load(str(out_pth), weights_only=True)
    assert "patch_embed.proj.weight" in sd and "pos_embed" in sd
    assert sd["patch_embed.proj.weight"].shape == (384, 3, 16, 16)
    assert not any("decoder" in k for k in sd)

    # Reconstruction grid from the pretrain checkpoint (paper Fig. 2 CLI).
    out_png = tmp_path / "recon.png"
    cli.main([
        "reconstruct", "--checkpoint", str(run_dir),
        "--images", str(img_dir), "--out", str(out_png), "-n", "2",
        "--set", "model_name=vit_s16", "--set", "image_embedding=384",
        "--set", "size=32", "--set", "compute_dtype=float32",
        "--set", "gelu_impl=null", "--set", "image_heads=null",
        "--set", "mae.decoder_dim=16", "--set", "mae.decoder_depth=1",
        "--set", "mae.decoder_heads=2",
    ])
    assert out_png.stat().st_size > 0


def test_random_resized_crop_flip():
    from mae_clip_tpu.data.images import random_resized_crop_flip

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(37, 51, 3)).astype(np.uint8)
    out = random_resized_crop_flip(img, 16, np.random.default_rng(1))
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    # Deterministic in the generator state; varies across seeds.
    again = random_resized_crop_flip(img, 16, np.random.default_rng(1))
    np.testing.assert_array_equal(out, again)
    other = random_resized_crop_flip(img, 16, np.random.default_rng(2))
    assert not np.array_equal(out, other)
    # Degenerate source (crop fallback) still produces the right shape.
    tiny = rng.integers(0, 255, size=(3, 90, 3)).astype(np.uint8)
    assert random_resized_crop_flip(tiny, 8,
                                    np.random.default_rng(0)).shape == \
        (8, 8, 3)


def test_image_loader_augment(tmp_path):
    import cv2
    rng = np.random.default_rng(5)
    for i in range(4):
        cv2.imwrite(str(tmp_path / f"{i}.png"),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))

    from mae_clip_tpu.data.pipeline import ImageDataset, make_image_loader
    ds = ImageDataset.from_directory(str(tmp_path), size=16)
    plain = next(make_image_loader(ds, 4, num_threads=1, seed=1))
    aug1 = next(make_image_loader(ds, 4, num_threads=1, seed=1,
                                  augment=True))
    aug1b = next(make_image_loader(ds, 4, num_threads=1, seed=1,
                                   augment=True))
    aug2 = next(make_image_loader(ds, 4, num_threads=1, seed=2,
                                  augment=True))
    assert aug1["image"].shape == plain["image"].shape
    np.testing.assert_array_equal(aug1["image"], aug1b["image"])  # (seed, i)
    assert not np.array_equal(aug1["image"], plain["image"])
    assert not np.array_equal(aug1["image"], aug2["image"])  # fresh crops


def test_mae_trainer_resume_continues_identically(tmp_path):
    """Resume-from-checkpoint for the MAE-pretraining objective reproduces
    uninterrupted training exactly (full TrainState roundtrip)."""
    from mae_clip_tpu.data.pipeline import ImageDataset, make_image_loader
    from mae_clip_tpu.train.checkpoint import CheckpointManager

    images = np.random.default_rng(7).normal(
        size=(8, 32, 32, 3)).astype(np.float32)
    ds = ImageDataset([f"{i}.png" for i in range(8)], size=32)

    def batches_for(epoch):
        return make_image_loader(ds, 4, shuffle=True, seed=100 + epoch,
                                 images=images, num_threads=1)

    def run(ckpt_dir, epochs, resume=False):
        cfg = tiny_cfg(epochs=epochs, checkpoints=str(ckpt_dir))
        model, tx, state = make_model_and_state(cfg)
        mngr = CheckpointManager(str(ckpt_dir))
        trainer = Trainer(cfg, model, state.params, tx=tx,
                          checkpoint_manager=mngr, objective="mae")
        start = trainer.restore() + 1 if resume else 0
        hist = trainer.fit(batches_for, batches_for, start_epoch=start)
        mngr.wait()
        return hist, trainer

    straight, _ = run(tmp_path / "a", epochs=3)
    run(tmp_path / "b", epochs=2)
    resumed, tr = run(tmp_path / "b", epochs=3, resume=True)
    assert len(resumed["train_loss"]) == 1
    np.testing.assert_allclose(resumed["train_loss"][0],
                               straight["train_loss"][2], rtol=1e-6)
    np.testing.assert_allclose(resumed["valid_loss"][0],
                               straight["valid_loss"][2], rtol=1e-6)
    tr.checkpoint_manager.close()


def test_device_augment_step_crops_inside_step():
    """(B, src, src, 3) uint8 batches with src != cfg.size route through
    ops/augment.py inside the jitted step: train crops randomly per step,
    eval resizes deterministically (train/loop._mae_images_and_forward)."""
    cfg = tiny_cfg()
    model, tx, state = make_model_and_state(cfg)
    step = make_mae_pretrain_step(model, tx, cfg)
    eval_step = make_mae_eval_step(model, cfg)
    rng = np.random.default_rng(0)
    src = 48  # != cfg.size == 32
    batch = {"image": jnp.asarray(rng.integers(
                 0, 256, size=(4, src, src, 3)).astype(np.uint8)),
             "valid": jnp.ones((4,), bool)}
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]          # learns through the crop
    # Same batch, different steps -> different crops -> different losses.
    assert len({round(l, 8) for l in losses}) == len(losses)
    # Eval: deterministic in state (same step counter -> same value).
    e1 = float(eval_step(state, batch)["loss"])
    e2 = float(eval_step(state, batch)["loss"])
    assert np.isfinite(e1) and e1 == e2


def test_cli_mae_pretrain_device_data_and_device_augment(tmp_path):
    """mae-pretrain over an HBM-staged store: index loaders + supersteps +
    in-step augmentation (device_data=true implies device crops)."""
    import cv2
    import json as _json

    from mae_clip_tpu import cli

    rng = np.random.default_rng(5)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(10):
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))

    run_dir = tmp_path / "run"
    cli.main([
        "mae-pretrain", "--images", str(img_dir),
        "--val-fraction", "0.3", "--no-progress",
        "--set", "batch_size=8", "--set", "epochs=2", "--set", "size=32",
        "--set", "device_data=true", "--set", "steps_per_call=2",
        "--set", "mae.aug_source_size=48",
        "--set", "compute_dtype=float32", "--set", "gelu_impl=null",
        "--set", "image_heads=null",
        "--set", "mae.decoder_dim=16", "--set", "mae.decoder_depth=1",
        "--set", "mae.decoder_heads=2",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    assert any(d.name.isdigit() for d in run_dir.iterdir())
    lines = [_json.loads(l) for l in
             open(tmp_path / "logs" / "metrics.jsonl")]
    assert len(lines) == 2
    assert all(np.isfinite(l["loss/train"]) for l in lines)


def test_cli_mae_pretrain_device_augment_file_loader(tmp_path):
    """--augment-mode device without device_data: the file loader ships
    fixed-geometry uint8 sources (cacheable) and crops happen in-step."""
    import cv2

    from mae_clip_tpu import cli

    rng = np.random.default_rng(6)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(6):
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))

    run_dir = tmp_path / "run"
    cli.main([
        "mae-pretrain", "--images", str(img_dir),
        "--val-fraction", "0.34", "--augment-mode", "device",
        "--no-progress",
        "--set", "batch_size=8", "--set", "epochs=1", "--set", "size=32",
        "--set", "cache_images=true", "--set", "mae.aug_source_size=48",
        "--set", "compute_dtype=float32", "--set", "gelu_impl=null",
        "--set", "image_heads=null",
        "--set", "mae.decoder_dim=16", "--set", "mae.decoder_depth=1",
        "--set", "mae.decoder_heads=2",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    assert any(d.name.isdigit() for d in run_dir.iterdir())


def test_cli_mae_pretrain_rejects_equal_aug_source_size(tmp_path):
    """device augmentation with mae.aug_source_size == size would be
    silently skipped by the geometry dispatch — the CLI must refuse."""
    import pytest

    from mae_clip_tpu import cli

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    with pytest.raises(SystemExit, match="aug_source_size"):
        cli.main([
            "mae-pretrain", "--images", str(img_dir), "--no-progress",
            "--set", "size=32", "--set", "mae.aug_source_size=32",
            "--set", "device_data=true",
        ])


def test_cli_mae_pretrain_sharded_device_store(tmp_path):
    """device_data_sharded=true: the store is row-sharded over the
    8-virtual-device mesh, batches come from blocked per-shard index
    loaders, and the run completes with finite losses + checkpoints."""
    import cv2
    import json as _json

    from mae_clip_tpu import cli

    rng = np.random.default_rng(6)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(18):                   # not divisible by 8 shards
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))

    run_dir = tmp_path / "run"
    cli.main([
        "mae-pretrain", "--images", str(img_dir),
        "--val-fraction", "0.5", "--no-progress",
        "--set", "batch_size=8", "--set", "epochs=2", "--set", "size=32",
        "--set", "device_data=true", "--set", "device_data_sharded=true",
        "--set", "steps_per_call=2", "--set", "mae.aug_source_size=48",
        "--set", "compute_dtype=float32", "--set", "gelu_impl=null",
        "--set", "image_heads=null",
        "--set", "mae.decoder_dim=16", "--set", "mae.decoder_depth=1",
        "--set", "mae.decoder_heads=2",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    assert any(d.name.isdigit() for d in run_dir.iterdir())
    lines = [_json.loads(l) for l in
             open(tmp_path / "logs" / "metrics.jsonl")]
    assert len(lines) == 2
    assert all(np.isfinite(l["loss/train"]) for l in lines)
