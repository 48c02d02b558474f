"""DistilBERT-compatible text encoder in JAX/flax.

The reference's text tower is HF ``DistilBertModel`` with the CLS-token
hidden state as the sentence embedding (reference: modules.py:34-51). This
implementation is weight-compatible with HF checkpoints (the importer in
interop/torch_import.py maps HF state_dict names onto this module tree) and
reproduces HF's exact fp32 math:

* learned positional embeddings added to word embeddings, LayerNorm eps=1e-12;
* attention scales ``q`` by 1/sqrt(dim_per_head) BEFORE the q@k.T matmul
  (HF modeling_distilbert.py order, kept for bit-parity);
* invalid-key scores replaced with ``finfo.min`` (masked_fill semantics);
* post-LN blocks: LayerNorm(attn + x) then LayerNorm(ffn + h);
* erf GELU in the FFN.

Attention can run through the Pallas flash kernel (``attn_impl='pallas'``) on
TPU; the XLA path is the parity reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mae_clip_tpu.models.layers import Dense, Dropout, Embed, LayerNorm, gelu_exact
from mae_clip_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    max_position_embeddings: int = 512
    dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    # "erf" = HF's exact GELU (REQUIRED for HF weight parity); "tanh" is the
    # ~2x-cheaper VPU approximation for from-scratch TPU recipes
    # (config.Config.gelu_impl threads it here).
    gelu: str = "erf"


class Embeddings(nn.Module):
    config: DistilBertConfig
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        c = self.config
        words = Embed(c.vocab_size, c.dim, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name="word_embeddings")(input_ids)
        seq_len = input_ids.shape[-1]
        positions = jnp.arange(seq_len)[None, :]
        pos = Embed(c.max_position_embeddings, c.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="position_embeddings")(positions)
        x = words + pos
        x = LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="LayerNorm")(x)
        x = Dropout(c.dropout, name="dropout")(x, deterministic)
        return x


class MultiHeadSelfAttention(nn.Module):
    config: DistilBertConfig
    attn_impl: str = "xla"
    attn_interpret: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, key_valid: Optional[jax.Array],
                 deterministic: bool = True) -> jax.Array:
        c = self.config
        b, s, _ = x.shape
        dh = c.dim // c.n_heads
        dense = lambda name: Dense(c.dim, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=name)

        def split(t):  # (B, S, D) -> (B, H, S, Dh)
            return t.reshape(b, s, c.n_heads, dh).transpose(0, 2, 1, 3)

        q = split(dense("q_lin")(x))
        k = split(dense("k_lin")(x))
        v = split(dense("v_lin")(x))
        # HF train-mode attention dropout (modeling_distilbert.py applies
        # nn.Dropout(config.attention_dropout) to the softmax'd weights);
        # the reference's text tower inherits it via modules.py:38.
        drop_rng = None
        if not deterministic and c.attention_dropout > 0.0:
            drop_rng = self.make_rng("dropout")
        ctx = multi_head_attention(
            q, k, v, key_valid=key_valid, sm_scale=1.0 / dh ** 0.5,
            impl=self.attn_impl, interpret=self.attn_interpret,
            dropout_rate=0.0 if deterministic else c.attention_dropout,
            dropout_rng=drop_rng)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, c.dim)
        return dense("out_lin")(ctx)


class TransformerBlock(nn.Module):
    config: DistilBertConfig
    attn_impl: str = "xla"
    attn_interpret: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, key_valid: Optional[jax.Array],
                 deterministic: bool = True) -> jax.Array:
        c = self.config
        ln = lambda name: LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        attn = MultiHeadSelfAttention(
            c, attn_impl=self.attn_impl, attn_interpret=self.attn_interpret,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="attention")(x, key_valid, deterministic)
        h = ln("sa_layer_norm")(attn + x)

        ff = Dense(c.hidden_dim, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="ffn_lin1")(h)
        ff = (gelu_exact(ff) if c.gelu == "erf"
              else jax.nn.gelu(ff, approximate=True))
        ff = Dense(c.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                   name="ffn_lin2")(ff)
        ff = Dropout(c.dropout, name="ffn_dropout")(ff, deterministic)
        return ln("output_layer_norm")(ff + h)


class DistilBertModel(nn.Module):
    """Returns the last hidden state, shape (B, S, dim)."""

    config: DistilBertConfig = DistilBertConfig()
    attn_impl: str = "xla"
    attn_interpret: bool = False
    remat: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        c = self.config
        key_valid = None if attention_mask is None else attention_mask.astype(bool)
        x = Embeddings(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="embeddings")(input_ids, deterministic)
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,))
        for i in range(c.n_layers):
            x = block_cls(
                c, attn_impl=self.attn_impl,
                attn_interpret=self.attn_interpret, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}")(x, key_valid, deterministic)
        return x


class TextEncoder(nn.Module):
    """CLS-token sentence embedding, mirroring reference modules.py:34-51."""

    config: DistilBertConfig = DistilBertConfig()
    attn_impl: str = "xla"
    attn_interpret: bool = False
    remat: bool = False
    target_token_idx: int = 0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        hidden = DistilBertModel(
            self.config, attn_impl=self.attn_impl,
            attn_interpret=self.attn_interpret, remat=self.remat,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="model")(input_ids, attention_mask, deterministic)
        return hidden[:, self.target_token_idx, :]
