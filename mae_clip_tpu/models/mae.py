"""Masked Autoencoder (MAE) over the ViT image tower.

Implements the capability the reference names but never shipped (reference:
README.md:2 "Training CLIP with MAE"; modules.py:20-26 ViT stub): 75% random
patch masking, a ViT encoder that sees only visible patches, a lightweight
decoder with mask tokens and fixed sincos positions, and per-patch pixel
reconstruction. The encoder weights are SHARED with the CLIP image tower so
the joint objective L = L_infonce + lambda * L_mae (BASELINE.json config 2)
trains one tower.

Two entry points over the same parameters:
* ``__call__(images, mask_rng)`` — masked training pass (25% visible) +
  decoder reconstruction; its pooled CLS also serves the FLIP-style joint
  contrastive loss.
* ``encode_full(images)`` — full-sequence inference pass (all patches, no
  decoder) for retrieval / zero-shot.

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
                                     _use_fused_blocks, patchify,
                                     run_self_blocks, sincos_pos_embed_2d)
from mae_clip_tpu.ops.attention import multi_head_attention
from mae_clip_tpu.ops.masking import (random_masking,
                                      scatter_with_mask_tokens)


@dataclasses.dataclass(frozen=True)
class MAEDecoderConfig:
    dim: int = 256
    depth: int = 4
    n_heads: int = 2     # head_dim 128 = MXU lane width (see config.MAEConfig)
    mlp_ratio: float = 4.0
    gelu: str = "tanh"   # no parity constraint on the decoder; ~2x cheaper


class MAEOutput(NamedTuple):
    pooled: jax.Array        # (B, dim) CLS feature from the visible pass
    pred_patches: jax.Array  # (B, N, P*P*C) reconstructed pixels
    target_patches: jax.Array
    mask: jax.Array          # (B, N); 1 = masked
    # With decoder_style='cross' the three tensors above cover ONLY the
    # masked positions ((B, N-K, .) / mask all-ones): the loss
    # sum(mse*mask)/sum(mask) is identical either way.


class CrossAttnBlock(nn.Module):
    """Pre-LN transformer block whose attention is CROSS-attention: queries
    are the (masked-position) decoder tokens, keys/values the encoded
    visible tokens. No self-attention among queries — the CrossMAE finding
    (arXiv:2401.14391) that masked-token interdependence is unnecessary for
    MAE reconstruction quality; each query runs in O(Sk) instead of O(Sq)."""

    config: ViTConfig
    attn_impl: str = "xla"
    attn_interpret: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_tokens: jax.Array, kv_tokens: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        from mae_clip_tpu.models.layers import Dropout
        from mae_clip_tpu.models.vit import gelu_exact

        c = self.config
        b, sq, _ = q_tokens.shape
        sk = kv_tokens.shape[1]
        dh = c.dim // c.n_heads
        ln = lambda name: LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        dense = lambda feats, name: Dense(feats, dtype=self.dtype,
                                          param_dtype=self.param_dtype,
                                          name=name)
        h = ln("norm1")(q_tokens)
        kvh = ln("norm_kv")(kv_tokens)
        q = dense(c.dim, "attn_q")(h)
        kv = dense(2 * c.dim, "attn_kv")(kvh)
        q = q.reshape(b, sq, c.n_heads, dh).transpose(0, 2, 1, 3)
        kv = kv.reshape(b, sk, 2, c.n_heads, dh).transpose(2, 0, 3, 1, 4)
        ctx = multi_head_attention(q, kv[0], kv[1], sm_scale=1.0 / dh ** 0.5,
                                   impl=("xla" if self.attn_impl ==
                                         "pallas_qkv" else self.attn_impl),
                                   interpret=self.attn_interpret)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sq, c.dim)
        x = q_tokens + dense(c.dim, "attn_proj")(ctx)

        h = ln("norm2")(x)
        h = dense(int(c.dim * c.mlp_ratio), "mlp_fc1")(h)
        h = (gelu_exact(h) if c.gelu == "erf"
             else jax.nn.gelu(h, approximate=True))
        h = dense(c.dim, "mlp_fc2")(h)
        h = Dropout(c.dropout, name="mlp_drop")(h, deterministic)
        return x + h


def collect_cross_block_weights(blocks, dtype) -> dict:
    """Stack CrossAttnBlock params into the fused_block_stack layout."""
    def stack(get):
        x = jnp.stack([get(b.variables["params"]) for b in blocks])
        return x.astype(dtype) if dtype is not None else x

    return {
        "ln1_g": stack(lambda p: p["norm1"]["scale"]),
        "ln1_b": stack(lambda p: p["norm1"]["bias"]),
        "lnkv_g": stack(lambda p: p["norm_kv"]["scale"]),
        "lnkv_b": stack(lambda p: p["norm_kv"]["bias"]),
        "wq": stack(lambda p: p["attn_q"]["kernel"]),
        "bq": stack(lambda p: p["attn_q"]["bias"]),
        "wkv": stack(lambda p: p["attn_kv"]["kernel"]),
        "bkv": stack(lambda p: p["attn_kv"]["bias"]),
        "wproj": stack(lambda p: p["attn_proj"]["kernel"]),
        "bproj": stack(lambda p: p["attn_proj"]["bias"]),
        "ln2_g": stack(lambda p: p["norm2"]["scale"]),
        "ln2_b": stack(lambda p: p["norm2"]["bias"]),
        "wfc1": stack(lambda p: p["mlp_fc1"]["kernel"]),
        "bfc1": stack(lambda p: p["mlp_fc1"]["bias"]),
        "wfc2": stack(lambda p: p["mlp_fc2"]["kernel"]),
        "bfc2": stack(lambda p: p["mlp_fc2"]["bias"]),
    }


class MAEViT(nn.Module):
    """ViT encoder (shared with CLIP) + MAE decoder."""

    config: ViTConfig
    decoder: MAEDecoderConfig = MAEDecoderConfig()
    mask_ratio: float = 0.75
    channels: int = 3
    attn_impl: str = "xla"
    # Decoder blocks may use a different attention impl than the (parity-
    # bound) encoder: the decoder runs the full 197-token sequence at few
    # heads, a shape where kernel choice matters most. None = inherit.
    decoder_attn_impl: Optional[str] = None
    # "full": MAE-paper decoder — self-attention over ALL positions after
    # scattering mask tokens (arXiv:2111.06377). "cross": CrossMAE-style —
    # decode ONLY masked positions, each cross-attending the encoded visible
    # tokens (arXiv:2401.14391); fewer decoder tokens, no scatter, no
    # quadratic self-attention.
    decoder_style: str = "full"
    # Fused Pallas block-stack path for the encoder blocks and the cross
    # decoder blocks ("auto" engages on TPU when the geometry qualifies;
    # see vit._use_fused_blocks). "off" = canonical per-block XLA path.
    block_impl: str = "off"
    attn_interpret: bool = False
    use_pallas_patch_embed: bool = False
    remat: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        d = self.decoder
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn = dict(attn_impl=self.attn_impl,
                    attn_interpret=self.attn_interpret)

        self.patch_embed = PatchEmbed(
            c, use_pallas=self.use_pallas_patch_embed, **common)
        self.cls_token = self.param("cls_token",
                                    nn.initializers.normal(0.02),
                                    (1, 1, c.dim), self.param_dtype)
        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock, static_argnums=(2,))
        self.blocks = [block_cls(c, **attn, **common, name=f"block_{i}")
                       for i in range(c.depth)]
        self.norm = LayerNorm(epsilon=1e-6, **common)

        self.decoder_embed = Dense(d.dim, **common)
        self.mask_token = self.param("mask_token",
                                     nn.initializers.normal(0.02),
                                     (1, 1, d.dim), self.param_dtype)
        dec_cfg = ViTConfig(image_size=c.image_size, patch_size=c.patch_size,
                            dim=d.dim, depth=d.depth, n_heads=d.n_heads,
                            mlp_ratio=d.mlp_ratio, gelu=d.gelu)
        dec_attn = dict(attn, attn_impl=(self.decoder_attn_impl
                                         or self.attn_impl))
        if self.decoder_style not in ("full", "cross"):
            raise ValueError(f"unknown decoder_style {self.decoder_style!r}")
        dec_block = (ViTBlock if self.decoder_style == "full"
                     else CrossAttnBlock)
        self.decoder_blocks = [
            dec_block(dec_cfg, **dec_attn, **common,
                      name=f"decoder_block_{i}")
            for i in range(d.depth)]
        self.dec_cfg = dec_cfg
        self.decoder_norm = LayerNorm(epsilon=1e-6, **common)
        patch_dim = c.patch_size * c.patch_size * self.channels
        self.decoder_pred = Dense(patch_dim, **common)

    # ------------------------------------------------------------------
    def _embed_patches(self, images: jax.Array) -> jax.Array:
        c = self.config
        x = self.patch_embed(images)
        enc_pe = jnp.asarray(
            sincos_pos_embed_2d(c.dim, c.grid_size, cls_token=True))[None]
        return x + enc_pe[:, 1:, :].astype(x.dtype), enc_pe

    def _run_encoder(self, tokens: jax.Array, enc_pe: jax.Array,
                     deterministic: bool) -> jax.Array:
        b = tokens.shape[0]
        c = self.config
        cls_tok = (jnp.broadcast_to(self.cls_token, (b, 1, c.dim))
                   + enc_pe[:, :1, :]).astype(tokens.dtype)
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        x = run_self_blocks(self.blocks, x, c, self.block_impl,
                            deterministic, self.is_initializing(),
                            self.dtype, interpret=self.attn_interpret)
        return self.norm(x)

    def encode_full(self, images: jax.Array,
                    deterministic: bool = True) -> jax.Array:
        """Full-sequence CLIP-inference pass: pooled CLS over ALL patches."""
        x, enc_pe = self._embed_patches(images)
        return self._run_encoder(x, enc_pe, deterministic)[:, 0]

    # ------------------------------------------------------------------
    def __call__(self, images: jax.Array, mask_rng: jax.Array,
                 deterministic: bool = True,
                 masking=None) -> MAEOutput:
        """``masking``: optional precomputed :class:`ops.masking.
        MaskingResult` rows for this batch — callers that split one batch
        into microbatches (GradCache accumulation, train/loop.py) draw the
        full-batch masking once and pass row slices here, so the union of
        microbatch passes is bit-identical to one giant-batch pass."""
        c = self.config
        b = images.shape[0]
        target = (images if images.ndim == 3
                  else patchify(images, c.patch_size))

        if masking is None:
            masking = random_masking(mask_rng, b, c.num_patches,
                                     self.mask_ratio)
        # Embed ONLY the visible patches (gather-then-project == the MAE
        # paper's project-then-gather, with 1/(1-mask_ratio) less matmul
        # work; optionally as one fused Pallas kernel).
        enc_pe = jnp.asarray(
            sincos_pos_embed_2d(c.dim, c.grid_size, cls_token=True))[None]
        x_vis = self.patch_embed(target, ids=masking.ids_keep,
                                 interpret=self.attn_interpret)
        pe_vis = jnp.take(enc_pe[0, 1:], masking.ids_keep, axis=0)
        x_vis = x_vis + pe_vis.astype(x_vis.dtype)           # (B, K, D)
        encoded = self._run_encoder(x_vis, enc_pe, deterministic)
        pooled = encoded[:, 0]

        # --- decoder ---
        d = self.decoder
        y = self.decoder_embed(encoded)
        dec_pe = jnp.asarray(
            sincos_pos_embed_2d(d.dim, c.grid_size, cls_token=True))[None]

        if self.decoder_style == "cross":
            # CrossMAE: queries = mask tokens at the MASKED positions only;
            # keys/values = the decoder-embedded visible tokens (+CLS). No
            # scatter, no full-length sequence, no quadratic self-attention.
            pe_vis = jnp.take(dec_pe[0, 1:], masking.ids_keep, axis=0)
            kv = y + jnp.concatenate(
                [jnp.broadcast_to(dec_pe[:, :1], (b, 1, d.dim)), pe_vis],
                axis=1).astype(y.dtype)
            pe_masked = jnp.take(dec_pe[0, 1:], masking.ids_masked, axis=0)
            q = (jnp.broadcast_to(self.mask_token,
                                  (b, masking.ids_masked.shape[1], d.dim))
                 + pe_masked).astype(y.dtype)
            if _use_fused_blocks(self.block_impl, self.dec_cfg,
                                 self.is_initializing()):
                from mae_clip_tpu.ops.block_kernel import (
                    fused_block_stack, fused_block_stack_fwd_xla_bwd)
                fn = (fused_block_stack_fwd_xla_bwd
                      if self.block_impl == "fwd" else fused_block_stack)
                w = collect_cross_block_weights(self.decoder_blocks,
                                                self.dtype)
                q = fn(q, kv, w, self.dec_cfg.n_heads,
                       self.dec_cfg.gelu, True, self.attn_interpret)
            else:
                for block in self.decoder_blocks:
                    q = block(q, kv, deterministic)
            pred = self.decoder_pred(self.decoder_norm(q))   # (B, N-K, PPC)
            from mae_clip_tpu.ops.masking import gather_patches_onehot
            target_masked = gather_patches_onehot(target, masking.ids_masked)
            ones = jnp.ones(masking.ids_masked.shape, dtype=jnp.float32)
            return MAEOutput(pooled=pooled, pred_patches=pred,
                             target_patches=target_masked, mask=ones)

        y_patches = scatter_with_mask_tokens(y[:, 1:], self.mask_token,
                                             masking.ids_restore)
        y = jnp.concatenate([y[:, :1], y_patches], axis=1)   # re-attach CLS
        y = y + dec_pe.astype(y.dtype)
        for block in self.decoder_blocks:
            y = block(y, deterministic)
        y = self.decoder_norm(y)
        pred = self.decoder_pred(y)[:, 1:]                   # drop CLS
        return MAEOutput(pooled=pooled, pred_patches=pred,
                         target_patches=target, mask=masking.mask)
