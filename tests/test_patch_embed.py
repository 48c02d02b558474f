"""Fused masked patch-embed Pallas kernel vs XLA formulation."""

import numpy as np
import jax
import jax.numpy as jnp

from mae_clip_tpu.ops.patch_embed import (_xla_masked_patch_embed,
                                          masked_patch_embed)


def _inputs(rng, b=2, n=16, d_in=24, k=4, d_m=8):
    patches = jnp.array(rng.normal(size=(b, n, d_in)).astype(np.float32))
    ids = jnp.array(np.stack([rng.choice(n, size=k, replace=False)
                              for _ in range(b)]).astype(np.int32))
    kernel = jnp.array(rng.normal(size=(d_in, d_m)).astype(np.float32))
    bias = jnp.array(rng.normal(size=(d_m,)).astype(np.float32))
    return patches, ids, kernel, bias


def test_kernel_matches_xla():
    rng = np.random.default_rng(0)
    patches, ids, kernel, bias = _inputs(rng)
    expected = _xla_masked_patch_embed(patches, ids, kernel, bias)
    got = masked_patch_embed(patches, ids, kernel, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_kernel_gradients_match_xla():
    rng = np.random.default_rng(1)
    patches, ids, kernel, bias = _inputs(rng)

    def loss_pallas(p, w, b):
        return jnp.sum(masked_patch_embed(p, ids, w, b, True) ** 2)

    def loss_xla(p, w, b):
        return jnp.sum(_xla_masked_patch_embed(p, ids, w, b) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(patches, kernel, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(patches, kernel, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5,
                                   rtol=1e-5)


def test_mae_with_pallas_patch_embed_matches_default():
    """MAEViT(use_pallas_patch_embed=True) == default path (interpret)."""
    from mae_clip_tpu.models.mae import MAEDecoderConfig, MAEViT
    from mae_clip_tpu.models.vit import ViTConfig

    tiny = ViTConfig(image_size=32, patch_size=8, dim=32, depth=1, n_heads=4,
                     pos_embed="sincos")
    rng = np.random.default_rng(2)
    x = jnp.array(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    m1 = MAEViT(tiny, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4))
    m2 = MAEViT(tiny, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4),
                use_pallas_patch_embed=True, attn_interpret=True)
    v = m1.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    o1 = m1.apply(v, x, jax.random.PRNGKey(2))
    o2 = m2.apply(v, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(o2.pooled), np.asarray(o1.pooled),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o2.pred_patches),
                               np.asarray(o1.pred_patches), atol=1e-5,
                               rtol=1e-4)
