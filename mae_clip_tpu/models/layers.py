"""Primitive layers with torch-exact math for fp32 parity.

The reference composes ``nn.Linear``/``nn.LayerNorm``/``nn.GELU``/``nn.Dropout``
(reference: modules.py:55-76). These primitives reproduce that math exactly:

* ``gelu_exact`` is the erf-based GELU (torch ``nn.GELU()`` default). NOTE:
  ``jax.nn.gelu`` defaults to the tanh approximation — always pass through
  here instead.
* ``LayerNorm`` uses biased variance and ``(x - mean) / sqrt(var + eps)``,
  matching ``torch.nn.LayerNorm``.
* ``Dense`` stores its kernel as (in, out) — transposed vs torch's (out, in).
  The checkpoint importer (interop/torch_import.py) transposes accordingly.

Parameters are kept in ``param_dtype`` (fp32 by default); compute may run in
bfloat16 on TPU via the ``dtype`` argument. Parity tests run fp32/fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU, bit-matching torch nn.GELU() at fp32."""
    return jax.nn.gelu(x, approximate=False)


class Dense(nn.Module):
    """Linear layer: y = x @ kernel + bias, kernel shape (in, out)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jnp.matmul(x, kernel, preferred_element_type=x.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


# Global default for LayerNorm statistics precision. fp32 stats are the
# parity-safe default; flipping to False computes stats in the compute dtype
# (bf16 on TPU), trading a little precision for less convert/reduce traffic.
LN_FP32_STATS_DEFAULT = True


class LayerNorm(nn.Module):
    """LayerNorm over the last axis with torch semantics (biased variance).

    ``fp32_stats`` (default: module-global LN_FP32_STATS_DEFAULT=True)
    computes mean/var in fp32 for exact torch parity; False keeps the
    compute dtype throughout (faster on TPU, bf16-safe for these widths).
    """

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fp32_stats: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (dim,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (dim,),
                          self.param_dtype)
        orig_dtype = self.dtype or x.dtype
        use_fp32 = (LN_FP32_STATS_DEFAULT if self.fp32_stats is None
                    else self.fp32_stats)
        stat_dtype = jnp.float32 if use_fp32 else x.dtype
        if stat_dtype != x.dtype:
            # Keep XLA from fusing the fp32 convert+reduce into the producing
            # matmul's epilogue: that fusion serializes MXU tiles against VPU
            # fp32 reductions (measured 1.50 -> 0.90 ms on the DistilBERT FFN
            # block at 16k tokens on v5e). The barrier is numerically the
            # identity and transparent to autodiff.
            (x,) = jax.lax.optimization_barrier((x,))
        xf = x.astype(stat_dtype)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(stat_dtype) + bias.astype(stat_dtype)
        return y.astype(orig_dtype)


class Dropout(nn.Module):
    """Dropout matching torch semantics (scale by 1/(1-p) at train time)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Embed(nn.Module):
    """Token embedding table (num_embeddings, features)."""

    num_embeddings: int
    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "embedding", nn.initializers.normal(stddev=0.02),
            (self.num_embeddings, self.features), self.param_dtype)
        out = jnp.take(table, ids, axis=0)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out
