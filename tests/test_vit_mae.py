"""ViT tower and MAE objective: shapes, masking invariants, patchify round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mae_clip_tpu.models.mae import MAEDecoderConfig, MAEViT
from mae_clip_tpu.models.vit import (ViTConfig, ViTEncoder, patchify,
                                     unpatchify, sincos_pos_embed_2d)
from mae_clip_tpu.ops.masking import random_masking

TINY = ViTConfig(image_size=32, patch_size=8, dim=32, depth=2, n_heads=4)


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    patches = patchify(jnp.array(imgs), 8)
    assert patches.shape == (2, 16, 8 * 8 * 3)
    back = unpatchify(patches, 8, 3)
    np.testing.assert_allclose(np.asarray(back), imgs, atol=1e-6)


def test_patchify_order_is_row_major():
    """Patch 0 must be the top-left 8x8 block."""
    imgs = np.zeros((1, 32, 32, 3), dtype=np.float32)
    imgs[0, :8, :8, :] = 1.0
    patches = np.asarray(patchify(jnp.array(imgs), 8))
    assert patches[0, 0].sum() == 8 * 8 * 3
    assert patches[0, 1:].sum() == 0


def test_sincos_pos_embed_properties():
    pe = sincos_pos_embed_2d(32, 4, cls_token=True)
    assert pe.shape == (17, 32)
    assert np.allclose(pe[0], 0.0)       # CLS position is zeros
    assert not np.allclose(pe[1], pe[2])  # distinct positions differ


def test_random_masking_invariants():
    res = random_masking(jax.random.PRNGKey(0), batch=4, num_patches=16,
                         mask_ratio=0.75)
    assert res.ids_keep.shape == (4, 4)
    assert res.mask.shape == (4, 16)
    mask = np.asarray(res.mask)
    assert np.all(mask.sum(axis=1) == 12)          # exactly 75% masked
    ids_keep = np.asarray(res.ids_keep)
    for b in range(4):
        assert len(set(ids_keep[b])) == 4          # unique kept indices
        assert np.all(mask[b, ids_keep[b]] == 0)   # kept patches are unmasked
    restore = np.asarray(res.ids_restore)
    shuffled = np.argsort(restore, axis=1)
    for b in range(4):
        assert sorted(shuffled[b]) == list(range(16))  # valid permutation


def test_vit_encoder_shapes():
    model = ViTEncoder(TINY)
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 32)


def test_mae_forward_shapes_and_determinism():
    model = MAEViT(TINY, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4),
                   mask_ratio=0.75)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    out = model.apply(variables, x, jax.random.PRNGKey(1))
    assert out.pooled.shape == (2, 32)
    assert out.pred_patches.shape == (2, 16, 8 * 8 * 3)
    assert out.mask.shape == (2, 16)
    # Same mask rng -> identical output; different rng -> different mask.
    out2 = model.apply(variables, x, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out.pred_patches),
                               np.asarray(out2.pred_patches), atol=0)
    out3 = model.apply(variables, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out.mask), np.asarray(out3.mask))


def test_mae_grads_flow_to_encoder_and_decoder():
    model = MAEViT(TINY, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4))
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    from mae_clip_tpu.ops.losses import mae_reconstruction_loss

    def loss_fn(params):
        out = model.apply({"params": params}, x, jax.random.PRNGKey(1))
        return mae_reconstruction_loss(out.pred_patches, out.target_patches,
                                       out.mask)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert any(n > 0 for n in norms)
    # Encoder patch-embed must receive gradient (shared tower trains).
    g_pe = grads["patch_embed"]["proj"]["kernel"]
    assert float(jnp.linalg.norm(g_pe)) > 0


def test_mae_encode_full_equals_zero_mask_pass():
    """Full-sequence inference pass == masked pass at mask_ratio=0 (the
    transformer is permutation-equivariant once pos-embeds are attached)."""
    model0 = MAEViT(TINY, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4),
                    mask_ratio=0.0)
    x = jnp.array(np.random.default_rng(7).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    variables = model0.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    masked_pooled = model0.apply(variables, x, jax.random.PRNGKey(3)).pooled
    full_pooled = model0.apply(variables, x, method=model0.encode_full)
    np.testing.assert_allclose(np.asarray(full_pooled),
                               np.asarray(masked_pooled), atol=2e-5,
                               rtol=1e-4)


def test_clip_encode_image_uses_full_pass_for_mae():
    """Retrieval features from a MAE tower must see all patches: two
    different mask rngs must produce IDENTICAL encode_image output."""
    from mae_clip_tpu.config import Config, MAEConfig
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig

    cfg = Config(model_name="vit_s16", projection_dim=8, size=32,
                 compute_dtype="float32", max_length=16,
                 mae=MAEConfig(enabled=True, mask_ratio=0.75, decoder_dim=16,
                               decoder_depth=1, decoder_heads=2))
    model = CLIPModel(cfg,
                      text_config=DistilBertConfig(vocab_size=64, dim=16,
                                                   n_layers=1, n_heads=2,
                                                   hidden_dim=32,
                                                   max_position_embeddings=32),
                      vit_config=TINY)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.array(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
             "input_ids": jnp.array(rng.integers(0, 64, (2, 8)).astype(np.int32)),
             "attention_mask": jnp.ones((2, 8), dtype=jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))
    f = model.apply(variables, batch["image"], method=model.encode_image)
    assert f.shape == (2, 32)
    # Train-path pooled (masked) differs from inference pooled (full).
    out = model.apply(variables, batch, mask_rng=jax.random.PRNGKey(2))
    assert out["image_embeddings"].shape == (2, 8)


def test_prepatchified_input_matches_image_input():
    """(B, N, P*P*C) pre-patchified input == NHWC input, for both the ViT
    encoder and the MAE path (host patchify layout matches device)."""
    from mae_clip_tpu.data.images import patchify_host

    rng = np.random.default_rng(11)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    patches = np.stack([patchify_host(im, 8) for im in imgs])
    np.testing.assert_allclose(patches, np.asarray(patchify(jnp.array(imgs), 8)),
                               atol=0)

    enc = ViTEncoder(TINY)
    v = enc.init(jax.random.PRNGKey(0), jnp.array(imgs))
    a = enc.apply(v, jnp.array(imgs))
    b = enc.apply(v, jnp.array(patches))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    mae = MAEViT(TINY, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4))
    vm = mae.init(jax.random.PRNGKey(0), jnp.array(imgs), jax.random.PRNGKey(1))
    oa = mae.apply(vm, jnp.array(imgs), jax.random.PRNGKey(2))
    ob = mae.apply(vm, jnp.array(patches), jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(oa.pred_patches),
                               np.asarray(ob.pred_patches), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oa.target_patches),
                               np.asarray(ob.target_patches), atol=1e-6)


# ---------------------------------------------------------------------------
# CrossMAE decoder style (decoder_style='cross', arXiv:2401.14391)
# ---------------------------------------------------------------------------

def test_masking_ids_masked_partition():
    """ids_keep + ids_masked partition [0, N) and agree with the mask."""
    res = random_masking(jax.random.PRNGKey(3), batch=3, num_patches=16,
                         mask_ratio=0.75)
    keep, masked = np.asarray(res.ids_keep), np.asarray(res.ids_masked)
    mask = np.asarray(res.mask)
    assert masked.shape == (3, 12)
    for b in range(3):
        assert sorted([*keep[b], *masked[b]]) == list(range(16))
        assert np.all(mask[b, masked[b]] == 1)


def test_cross_decoder_shapes_and_shared_encoder():
    """'cross' decodes only masked positions; the CLIP pooled feature is
    bit-identical to 'full' (the visible encoder pass is shared and the
    decoder style only changes what happens after)."""
    dec = MAEDecoderConfig(dim=16, depth=1, n_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    full = MAEViT(TINY, decoder=dec, mask_ratio=0.75, decoder_style="full")
    variables = full.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    cross = MAEViT(TINY, decoder=dec, mask_ratio=0.75, decoder_style="cross")
    cvars = cross.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    out_f = full.apply(variables, x, jax.random.PRNGKey(1))
    out_c = cross.apply(cvars, x, jax.random.PRNGKey(1))
    assert out_c.pred_patches.shape == (2, 12, 8 * 8 * 3)   # masked only
    assert out_c.target_patches.shape == (2, 12, 8 * 8 * 3)
    assert np.all(np.asarray(out_c.mask) == 1.0)
    # Shared encoder: pooled CLS identical across styles for the same rng
    # (encoder params are initialized identically; decoder params differ).
    np.testing.assert_allclose(np.asarray(out_f.pooled),
                               np.asarray(out_c.pooled), atol=1e-6)

    # Cross targets are exactly the masked rows of the full-style targets.
    from mae_clip_tpu.ops.masking import random_masking as rm
    masking = rm(jax.random.PRNGKey(1), 2, 16, 0.75)
    want = np.take_along_axis(np.asarray(out_f.target_patches),
                              np.asarray(masking.ids_masked)[:, :, None],
                              axis=1)
    np.testing.assert_allclose(np.asarray(out_c.target_patches), want,
                               atol=0)


def test_cross_decoder_grads_flow():
    from mae_clip_tpu.ops.losses import mae_reconstruction_loss

    model = MAEViT(TINY, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4),
                   decoder_style="cross")
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    def loss_fn(params):
        out = model.apply({"params": params}, x, jax.random.PRNGKey(1))
        return mae_reconstruction_loss(out.pred_patches, out.target_patches,
                                       out.mask)

    grads = jax.grad(loss_fn)(variables["params"])
    g_pe = grads["patch_embed"]["proj"]["kernel"]
    assert float(jnp.linalg.norm(g_pe)) > 0          # shared tower trains
    assert float(jnp.linalg.norm(grads["mask_token"])) > 0
    g_kv = grads["decoder_block_0"]["attn_kv"]["kernel"]
    assert float(jnp.linalg.norm(g_kv)) > 0


def test_cross_decoder_in_clip_train_step():
    """Joint CLIP+MAE train step runs with decoder_style='cross' and the
    loss decreases on a fixed batch."""
    import dataclasses
    from mae_clip_tpu.config import MAEConfig, flagship_tpu_config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    cfg = flagship_tpu_config(
        batch_size=4, size=32, max_length=8, compute_dtype="float32",
        mae=MAEConfig(enabled=True, mask_ratio=0.75, decoder_dim=16,
                      decoder_depth=1, decoder_heads=2,
                      decoder_style="cross"))
    tc = DistilBertConfig(vocab_size=64, dim=32, n_layers=1, n_heads=4,
                          hidden_dim=64, max_position_embeddings=16)
    vc = ViTConfig(image_size=32, patch_size=8, dim=32, depth=1, n_heads=4,
                   pos_embed="sincos")
    model = CLIPModel(cfg, text_config=tc, vit_config=vc, attn_impl="xla")
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, size=(4, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((4, 8), jnp.int32),
        "valid": jnp.ones((4,), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_clip_from_masked_false_uses_full_sequence_features():
    """Classic (non-FLIP) joint objective: the contrastive branch runs a
    separate FULL-sequence pass, so in eval mode image_embeddings must equal
    projecting encode_image's features exactly — independent of the mask rng
    — while the MAE loss still comes from the masked pass."""
    from mae_clip_tpu.config import Config, MAEConfig
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig

    cfg = Config(model_name="vit_s16", projection_dim=8, size=32,
                 compute_dtype="float32", max_length=16,
                 mae=MAEConfig(enabled=True, mask_ratio=0.75, decoder_dim=16,
                               decoder_depth=1, decoder_heads=2,
                               clip_from_masked=False))
    text_cfg = DistilBertConfig(vocab_size=64, dim=16, n_layers=1, n_heads=2,
                                hidden_dim=32, max_position_embeddings=32)
    model = CLIPModel(cfg, text_config=text_cfg, vit_config=TINY)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.array(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
             "input_ids": jnp.array(rng.integers(0, 64, (2, 8)).astype(np.int32)),
             "attention_mask": jnp.ones((2, 8), dtype=jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))

    out_a = model.apply(variables, batch, mask_rng=jax.random.PRNGKey(2))
    out_b = model.apply(variables, batch, mask_rng=jax.random.PRNGKey(3))
    # Contrastive features are mask-independent (full pass)...
    np.testing.assert_allclose(np.asarray(out_a["image_embeddings"]),
                               np.asarray(out_b["image_embeddings"]),
                               atol=1e-6)
    # ...and equal the inference encode_image -> projection path.
    feats = model.apply(variables, batch["image"], method=model.encode_image)
    proj = model.apply(variables, feats, method=model.project_image)
    np.testing.assert_allclose(np.asarray(out_a["image_embeddings"]),
                               np.asarray(proj), atol=1e-6)
    # The masked pass still drives reconstruction: mae_loss varies with rng.
    assert "mae_loss" in out_a
    assert float(out_a["mae_loss"]) != float(out_b["mae_loss"])

    # The FLIP default on identical params differs (masked-pass features).
    flip = CLIPModel(cfg.replace(mae=cfg.mae.__class__(
        enabled=True, mask_ratio=0.75, decoder_dim=16, decoder_depth=1,
        decoder_heads=2, clip_from_masked=True)),
        text_config=text_cfg, vit_config=TINY)
    out_f = flip.apply(variables, batch, mask_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out_f["image_embeddings"]),
                           np.asarray(out_a["image_embeddings"]))


def test_joint_mae_loss_ignores_invalid_rows():
    """Padded tail rows (valid=False) must not pollute the joint objective:
    replacing an invalid row's image with garbage leaves clip_loss,
    mae_loss, and the total unchanged (regression: the MAE term used the
    raw patch mask over all B rows)."""
    from mae_clip_tpu.config import Config, MAEConfig
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig

    cfg = Config(model_name="vit_s16", projection_dim=8, size=32,
                 compute_dtype="float32", max_length=16,
                 mae=MAEConfig(enabled=True, mask_ratio=0.75, decoder_dim=16,
                               decoder_depth=1, decoder_heads=2))
    text_cfg = DistilBertConfig(vocab_size=64, dim=16, n_layers=1, n_heads=2,
                                hidden_dim=32, max_position_embeddings=32)
    model = CLIPModel(cfg, text_config=text_cfg, vit_config=TINY)
    rng = np.random.default_rng(4)
    imgs = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    batch = {"image": jnp.array(imgs),
             "input_ids": jnp.array(rng.integers(0, 64, (4, 8))
                                    .astype(np.int32)),
             "attention_mask": jnp.ones((4, 8), dtype=jnp.int32),
             "valid": jnp.array([True, True, False, False])}
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))

    out_a = model.apply(variables, batch, mask_rng=jax.random.PRNGKey(2))
    garbage = imgs.copy()
    garbage[2:] = 100.0 * rng.normal(size=(2, 32, 32, 3))
    out_b = model.apply(variables, dict(batch, image=jnp.array(garbage)),
                        mask_rng=jax.random.PRNGKey(2))
    for k in ("clip_loss", "mae_loss", "loss"):
        np.testing.assert_allclose(float(out_a[k]), float(out_b[k]),
                                   rtol=1e-6, err_msg=k)
