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
