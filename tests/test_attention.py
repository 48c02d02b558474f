"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mae_clip_tpu.ops.attention import attention_xla, flash_attention


def _rand_qkv(rng, b=2, h=3, s=37, d=16):
    q = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    return jnp.array(q), jnp.array(k), jnp.array(v)


def test_flash_matches_xla_unmasked():
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    scale = 1.0 / q.shape[-1] ** 0.5
    expected = attention_xla(q, k, v, None, scale)
    got = flash_attention(q, k, v, None, scale, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)


def test_flash_matches_xla_masked():
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, b=2, h=2, s=29, d=8)
    key_valid = np.ones((2, 29), dtype=np.float32)
    key_valid[0, 20:] = 0
    key_valid[1, 5:] = 0
    kv = jnp.array(key_valid)
    scale = 1.0 / q.shape[-1] ** 0.5
    expected = attention_xla(q, k, v, kv.astype(bool), scale)
    got = flash_attention(q, k, v, kv, scale, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)


def test_flash_multi_key_block():
    """Force >1 key block to exercise the online-softmax loop."""
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, b=1, h=1, s=300, d=8)
    scale = 1.0 / 8 ** 0.5
    expected = attention_xla(q, k, v, None, scale)
    got = flash_attention(q, k, v, None, scale, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)


def test_flash_gradients_match_xla():
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, b=1, h=2, s=19, d=8)
    key_valid = jnp.array(np.concatenate(
        [np.ones((1, 15), np.float32), np.zeros((1, 4), np.float32)], axis=1))
    scale = 1.0 / 8 ** 0.5

    def f_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v, key_valid.astype(bool), scale) ** 2)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, key_valid, scale, 128, 128,
                                       True) ** 2)

    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_xla, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


# ---------------------------------------------------------------------------
# qkv-packed single-shot attention (fused_qkv_attention / qkv_packed_attention)
# ---------------------------------------------------------------------------

from mae_clip_tpu.ops.attention import fused_qkv_attention  # noqa: E402


@pytest.mark.parametrize("b,s,h,d", [(2, 13, 2, 16), (3, 40, 2, 32),
                                     (2, 16, 6, 8)])
@pytest.mark.parametrize("masked", [False, True])
def test_qkv_packed_matches_xla(b, s, h, d, masked):
    """Packed-kernel values AND gradients == canonical unpack+XLA path.

    The packed layout is the fused qkv matmul output: columns ordered as
    reshape(B, S, 3, H, Dh). Sequence lengths deliberately not multiples
    of 8 to exercise the pad+mask path."""
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * h * d)).astype(np.float32))
    key_valid = None
    if masked:
        key_valid = jnp.asarray(
            (rng.random((b, s)) > 0.25).astype(np.float32))

    def run(impl):
        def loss(x):
            o = fused_qkv_attention(x, h, key_valid=key_valid, impl=impl,
                                    interpret=True)
            return jnp.sum(jnp.sin(o)), o
        (l, o), g = jax.value_and_grad(loss, has_aux=True)(qkv)
        return np.asarray(o), np.asarray(g)

    o_ref, g_ref = run("xla")
    o_pk, g_pk = run("pallas_qkv")
    np.testing.assert_allclose(o_pk, o_ref, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(g_pk, g_ref, atol=2e-4, rtol=1e-3)


def test_qkv_packed_auto_resolves_xla_off_tpu():
    """'auto' (and multi_head's 'pallas_qkv' alias) must run on CPU: they
    fall back to the XLA path when no TPU backend is present."""
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.normal(size=(2, 9, 3 * 2 * 8)).astype(np.float32))
    out_auto = fused_qkv_attention(qkv, 2, impl="auto")
    out_xla = fused_qkv_attention(qkv, 2, impl="xla")
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla))


def test_attention_dropout_statistics():
    """Post-softmax probability dropout (HF attention_dropout placement):
    inverted scaling preserves the expectation of the context, and distinct
    rngs give distinct outputs."""
    import jax
    from mae_clip_tpu.ops.attention import attention_xla

    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(1, 2, 6, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 6, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 6, 8)).astype(np.float32))

    base = np.asarray(attention_xla(q, k, v))
    d1 = attention_xla(q, k, v, dropout_rate=0.5,
                       dropout_rng=jax.random.PRNGKey(0))
    d2 = attention_xla(q, k, v, dropout_rate=0.5,
                       dropout_rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(d1), base)
    assert not np.allclose(np.asarray(d1), np.asarray(d2))

    # E[dropout(probs)/keep] == probs => mean context over draws ~= base.
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    mean = np.asarray(jax.jit(lambda ks: jnp.mean(jax.vmap(
        lambda key: attention_xla(q, k, v, dropout_rate=0.5,
                                  dropout_rng=key))(ks), axis=0))(keys))
    np.testing.assert_allclose(mean, base, atol=0.2)


def test_attention_dropout_forces_xla_dispatch():
    """multi_head_attention with active dropout must not route to a Pallas
    kernel (they never materialize the probability matrix); rate=0 or no rng
    keeps the requested impl path byte-identical."""
    import jax
    from mae_clip_tpu.ops.attention import attention_xla, multi_head_attention

    rng = np.random.default_rng(10)
    q = jnp.asarray(rng.normal(size=(1, 2, 5, 8)).astype(np.float32))
    k, v = q + 1, q - 1
    out = multi_head_attention(q, k, v, impl="auto", dropout_rate=0.3,
                               dropout_rng=jax.random.PRNGKey(0))
    expect = attention_xla(q, k, v, dropout_rate=0.3,
                           dropout_rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect))
    # Inactive dropout (no rng) leaves the deterministic path untouched.
    out0 = multi_head_attention(q, k, v, impl="xla", dropout_rate=0.3)
    np.testing.assert_allclose(np.asarray(out0),
                               np.asarray(attention_xla(q, k, v)))
