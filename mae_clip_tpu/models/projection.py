"""ProjectionHead: Linear -> GELU -> Linear -> Dropout -> +residual -> LayerNorm.

Exact functional twin of the reference head (reference: modules.py:55-76):
the residual is taken from the FIRST linear's output (``projected``), GELU is
the erf variant (torch ``nn.GELU()`` default), and LayerNorm uses torch's
default eps=1e-5. Two independent instances project the image (2048/384-d)
and text (768-d) features into the shared ``projection_dim`` (=256) space.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mae_clip_tpu.models.layers import Dense, Dropout, LayerNorm, gelu_exact


class ProjectionHead(nn.Module):
    projection_dim: int = 256
    dropout: float = 0.1
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dense = lambda name: Dense(self.projection_dim, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=name)
        projected = dense("projection")(x)
        y = gelu_exact(projected)
        y = dense("fc")(y)
        y = Dropout(self.dropout, name="dropout")(y, deterministic)
        y = y + projected
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="layer_norm")(y)
        return y
