"""Masked Autoencoder (MAE) over the ViT image tower.

Implements the capability the reference names but never shipped (reference:
README.md:2 "Training CLIP with MAE"; modules.py:20-26 ViT stub): 75% random
patch masking, a ViT encoder that sees only visible patches, a lightweight
decoder with mask tokens and fixed sincos positions, and per-patch pixel
reconstruction. The encoder weights are SHARED with the CLIP image tower so
the joint objective L = L_infonce + lambda * L_mae (BASELINE.json config 2)
trains one tower.

TPU-first details: static visible count via argsort-of-random-keys masking
(ops/masking.py), gathers instead of boolean indexing, NHWC images, and the
shared XLA/Pallas attention op inside every block.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mae_clip_tpu.models.layers import Dense, LayerNorm
from mae_clip_tpu.models.vit import (PatchEmbed, ViTBlock, ViTConfig,
                                     patchify, sincos_pos_embed_2d)
from mae_clip_tpu.ops.masking import (gather_patches, random_masking,
                                      scatter_with_mask_tokens)


@dataclasses.dataclass(frozen=True)
class MAEDecoderConfig:
    dim: int = 256
    depth: int = 4
    n_heads: int = 8
    mlp_ratio: float = 4.0


class MAEOutput(NamedTuple):
    pooled: jax.Array        # (B, dim) CLS feature from the visible pass
    pred_patches: jax.Array  # (B, N, P*P*C) reconstructed pixels
    target_patches: jax.Array
    mask: jax.Array          # (B, N); 1 = masked


class MAEViT(nn.Module):
    """ViT encoder (shared with CLIP) + MAE decoder.

    ``encode`` runs the full-sequence CLIP path; ``__call__`` runs the masked
    MAE path and also returns the pooled CLS feature of the *visible* pass so
    a joint step can reuse one encoder invocation if desired.
    """

    config: ViTConfig
    decoder: MAEDecoderConfig = MAEDecoderConfig()
    mask_ratio: float = 0.75
    attn_impl: str = "xla"
    attn_interpret: bool = False
    remat: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    def _encoder_blocks(self):
        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock, static_argnums=(2,))
        return [block_cls(self.config, attn_impl=self.attn_impl,
                          attn_interpret=self.attn_interpret, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"block_{i}")
                for i in range(self.config.depth)]

    @nn.compact
    def __call__(self, images: jax.Array, mask_rng: jax.Array,
                 deterministic: bool = True) -> MAEOutput:
        c = self.config
        b = images.shape[0]
        n = c.num_patches

        # --- encoder over visible patches only ---
        x = PatchEmbed(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="patch_embed")(images)
        enc_pe = jnp.asarray(
            sincos_pos_embed_2d(c.dim, c.grid_size, cls_token=True))[None]
        x = x + enc_pe[:, 1:, :].astype(x.dtype)

        masking = random_masking(mask_rng, b, n, self.mask_ratio)
        x_vis = gather_patches(x, masking.ids_keep)          # (B, K, D)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, c.dim), self.param_dtype)
        cls_tok = (jnp.broadcast_to(cls, (b, 1, c.dim))
                   + enc_pe[:, :1, :]).astype(x_vis.dtype)
        x_vis = jnp.concatenate([cls_tok, x_vis], axis=1)

        for block in self._encoder_blocks():
            x_vis = block(x_vis, deterministic)
        x_vis = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="norm")(x_vis)
        pooled = x_vis[:, 0]

        # --- decoder ---
        d = self.decoder
        y = Dense(d.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="decoder_embed")(x_vis)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, d.dim), self.param_dtype)
        y_patches = scatter_with_mask_tokens(y[:, 1:], mask_token,
                                             masking.ids_restore)
        y = jnp.concatenate([y[:, :1], y_patches], axis=1)   # re-attach CLS
        dec_pe = jnp.asarray(
            sincos_pos_embed_2d(d.dim, c.grid_size, cls_token=True))[None]
        y = y + dec_pe.astype(y.dtype)

        dec_cfg = ViTConfig(image_size=c.image_size, patch_size=c.patch_size,
                            dim=d.dim, depth=d.depth, n_heads=d.n_heads,
                            mlp_ratio=d.mlp_ratio)
        for i in range(d.depth):
            y = ViTBlock(dec_cfg, attn_impl=self.attn_impl,
                         attn_interpret=self.attn_interpret, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"decoder_block_{i}")(y, deterministic)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="decoder_norm")(y)
        patch_dim = c.patch_size * c.patch_size * images.shape[-1]
        pred = Dense(patch_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="decoder_pred")(y)[:, 1:]          # drop CLS

        target = patchify(images, c.patch_size)
        return MAEOutput(pooled=pooled, pred_patches=pred,
                         target_patches=target, mask=masking.mask)
