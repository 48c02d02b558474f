"""DistilBERT text tower parity vs HuggingFace (random-init, no network)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import transformers

from mae_clip_tpu.interop.torch_import import import_distilbert
from mae_clip_tpu.models.distilbert import (DistilBertConfig, DistilBertModel,
                                            TextEncoder)

SMALL = dict(vocab_size=99, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
             max_position_embeddings=48)


def _small_pair():
    torch.manual_seed(0)
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=SMALL["vocab_size"], dim=SMALL["dim"],
        n_layers=SMALL["n_layers"], n_heads=SMALL["n_heads"],
        hidden_dim=SMALL["hidden_dim"],
        max_position_embeddings=SMALL["max_position_embeddings"],
        dropout=0.0, attention_dropout=0.0, attn_implementation="eager")
    hf = transformers.DistilBertModel(hf_cfg).eval()
    params = import_distilbert(hf.state_dict())
    ours = DistilBertModel(DistilBertConfig(**SMALL))
    return hf, ours, params


def test_last_hidden_state_parity():
    hf, ours, params = _small_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, SMALL["vocab_size"], size=(3, 17)).astype(np.int32)
    mask = np.ones((3, 17), dtype=np.int32)
    mask[0, 9:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = ours.apply({"params": params}, jnp.array(ids), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=1e-4)


def test_cls_token_sentence_embedding():
    """TextEncoder returns last_hidden_state[:, 0, :] (reference modules.py:46-51)."""
    hf, _, params = _small_pair()
    enc = TextEncoder(DistilBertConfig(**SMALL))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, SMALL["vocab_size"], size=(2, 11)).astype(np.int32)
    mask = np.ones((2, 11), dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long)
                      ).last_hidden_state[:, 0, :].numpy()
    got = enc.apply({"params": {"model": params}}, jnp.array(ids),
                    jnp.array(mask))
    assert got.shape == (2, SMALL["dim"])
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=1e-4)


def test_padding_mask_blocks_attention():
    """Changing tokens behind the mask must not change unmasked outputs."""
    _, ours, params = _small_pair()
    ids = np.full((1, 12), 7, dtype=np.int32)
    mask = np.ones((1, 12), dtype=np.int32)
    mask[0, 6:] = 0
    out1 = ours.apply({"params": params}, jnp.array(ids), jnp.array(mask))
    ids2 = ids.copy()
    ids2[0, 6:] = 3
    out2 = ours.apply({"params": params}, jnp.array(ids2), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(out1[:, :6]), np.asarray(out2[:, :6]),
                               atol=1e-6)


def test_train_mode_attention_dropout_active():
    """HF DistilBERT applies nn.Dropout(attention_dropout) to the softmax'd
    attention weights in train mode (modeling_distilbert.py) — the tower the
    reference delegates to at modules.py:38. With every OTHER dropout zeroed,
    train-mode outputs must vary with the dropout rng and differ from eval
    mode; attention_dropout=0 restores rng-independence."""
    import jax

    cfg_drop = DistilBertConfig(**SMALL, dropout=0.0, attention_dropout=0.5)
    model = DistilBertModel(cfg_drop)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, SMALL["vocab_size"], (2, 9)).astype(np.int32))
    mask = jnp.ones((2, 9), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]

    def run(cfg, key, det):
        m = DistilBertModel(cfg)
        return np.asarray(m.apply(
            {"params": params}, ids, mask, deterministic=det,
            rngs={} if det else {"dropout": jax.random.PRNGKey(key)}))

    eval_out = run(cfg_drop, 0, det=True)
    t1 = run(cfg_drop, 1, det=False)
    t2 = run(cfg_drop, 2, det=False)
    assert not np.allclose(t1, eval_out)
    assert not np.allclose(t1, t2)

    cfg_nodrop = DistilBertConfig(**SMALL, dropout=0.0, attention_dropout=0.0)
    n1 = run(cfg_nodrop, 1, det=False)
    n2 = run(cfg_nodrop, 2, det=False)
    np.testing.assert_allclose(n1, n2, atol=1e-6)
    np.testing.assert_allclose(n1, eval_out, atol=1e-6)
