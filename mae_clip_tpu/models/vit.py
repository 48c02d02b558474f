"""Vision Transformer image tower (MAE-capable).

The reference names a ViT tower but ships it commented out (reference:
modules.py:20-26, ``vit_base_patch16_224``); this module realizes it
TPU-first. Patch embedding is a reshape + one large matmul (MXU-friendly,
identical math to a stride-16 conv), images are NHWC, blocks are pre-LN with
erf GELU, and attention dispatches to the shared XLA/Pallas op.

``pool='cls'`` with a class token matches timm's ViT head-less output
(``num_classes=0``), so a timm checkpoint maps onto this tree via
interop/torch_import.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mae_clip_tpu.models.layers import Dense, Dropout, LayerNorm, gelu_exact
from mae_clip_tpu.ops.attention import fused_qkv_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    dim: int = 384
    depth: int = 12
    n_heads: int = 6
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    pos_embed: str = "learned"   # "learned" (timm-compatible) | "sincos" (MAE)
    pool: str = "cls"            # "cls" | "mean"
    # MLP activation. "erf" is torch nn.GELU() — REQUIRED for timm weight
    # parity (keep for any tower that loads .pth checkpoints). "tanh" is the
    # BERT/GPT-2 approximation: measured ~2x cheaper fwd+bwd on the VPU at
    # v5e (erf lowers to a long fp32 polynomial); used where no parity
    # constraint exists (the MAE decoder, which the reference never shipped).
    gelu: str = "erf"            # "erf" | "tanh"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2


VIT_S16 = ViTConfig(dim=384, depth=12, n_heads=6)
VIT_B16 = ViTConfig(dim=768, depth=12, n_heads=12)


def sincos_pos_embed_2d(dim: int, grid_size: int,
                        cls_token: bool = False) -> np.ndarray:
    """Fixed 2D sine-cosine positional embeddings (MAE paper, appendix)."""
    assert dim % 4 == 0
    pos = np.arange(grid_size, dtype=np.float64)
    omega = np.arange(dim // 4, dtype=np.float64) / (dim / 4.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("p,d->pd", pos, omega)
    emb_1d = np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (g, dim/2)
    emb_h = np.repeat(emb_1d[:, None, :], grid_size, axis=1)
    emb_w = np.repeat(emb_1d[None, :, :], grid_size, axis=0)
    emb = np.concatenate([emb_h, emb_w], axis=-1).reshape(-1, dim)
    if cls_token:
        emb = np.concatenate([np.zeros((1, dim)), emb], axis=0)
    return emb.astype(np.float32)


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) NHWC -> (B, N, P*P*C) patches, row-major patch order."""
    b, h, w, c = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)        # (B, gh, gw, p, p, C)
    return x.reshape(b, gh * gw, p * p * c)


def unpatchify(patches: jax.Array, patch_size: int, channels: int = 3
               ) -> jax.Array:
    """Inverse of :func:`patchify`."""
    b, n, _ = patches.shape
    p = patch_size
    g = int(round(n ** 0.5))
    x = patches.reshape(b, g, g, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * p, g * p, channels)


class _PatchProj(nn.Module):
    """Linear patch projection with an optional fused masked-gather path.

    Param names match Dense (kernel/bias) so checkpoints are unaffected.
    With ``ids`` given, only those patch rows are embedded — via the Pallas
    fused gather+matmul kernel (ops/patch_embed.py) when ``use_pallas``,
    else the XLA take_along_axis formulation.
    """

    features: int
    use_pallas: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array, ids: Optional[jax.Array] = None,
                 interpret: bool = False) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (patches.shape[-1], self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        if self.dtype is not None:
            patches = patches.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        if ids is None:
            y = jnp.matmul(patches, kernel,
                           preferred_element_type=patches.dtype)
            return y + bias
        if self.use_pallas:
            from mae_clip_tpu.ops.patch_embed import masked_patch_embed
            return masked_patch_embed(patches, ids, kernel, bias, interpret)
        gathered = jnp.take_along_axis(patches, ids[:, :, None], axis=1)
        y = jnp.matmul(gathered, kernel,
                       preferred_element_type=gathered.dtype)
        return y + bias


class PatchEmbed(nn.Module):
    """Patchify + linear projection == non-overlapping conv, as one matmul.

    Accepts (B, H, W, C) images OR pre-patchified (B, N, P*P*C) input.
    Pre-patchifying on the HOST is the TPU-friendly path: device-side
    reshape/transpose of NHWC images has minor dimension C=3, which maps
    terribly onto the (8, 128) tile and generates layout-change copies.

    ``ids`` embeds only the selected patch rows (the MAE visible set).
    """

    config: ViTConfig
    use_pallas: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, ids: Optional[jax.Array] = None,
                 interpret: bool = False) -> jax.Array:
        c = self.config
        patches = (images if images.ndim == 3
                   else patchify(images, c.patch_size))
        return _PatchProj(c.dim, use_pallas=self.use_pallas,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="proj")(patches, ids, interpret)


def _use_fused_blocks(block_impl: str, cfg: ViTConfig,
                      is_initializing: bool) -> bool:
    """Gate for the fused Pallas block-stack path (ops/block_kernel.py).

    Requirements: MXU-width heads (head_dim % 128 == 0 — the flagship
    geometry; canonical timm/HF geometries keep XLA), dropout-free blocks
    (the kernel is deterministic), and a supported GELU. "auto" engages
    only on TPU. Init always runs the unfused path so flax creates the
    per-block params the fused path reads.
    """
    if block_impl == "off" or is_initializing:
        return False
    if cfg.dim % cfg.n_heads or (cfg.dim // cfg.n_heads) % 128:
        return False
    if cfg.dropout != 0.0 or cfg.gelu not in ("erf", "tanh"):
        return False
    if block_impl in ("on", "fwd"):
        return True
    import jax as _jax
    return block_impl == "auto" and _jax.default_backend() == "tpu"


def collect_self_block_weights(blocks, dim: int, dtype) -> dict:
    """Stack ViTBlock params into the fused_block_stack layout.

    The fused qkv kernel splits into wq (first D columns) / wkv (k+v
    columns); lnkv slots are filled with ln1 (ignored when cross=False,
    but DMA'd, so they must exist)."""
    def stack(get):
        x = jnp.stack([get(b.variables["params"]) for b in blocks])
        return x.astype(dtype) if dtype is not None else x

    d = dim
    w = {
        "ln1_g": stack(lambda p: p["norm1"]["scale"]),
        "ln1_b": stack(lambda p: p["norm1"]["bias"]),
        "wq": stack(lambda p: p["attn_qkv"]["kernel"][:, :d]),
        "bq": stack(lambda p: p["attn_qkv"]["bias"][:d]),
        "wkv": stack(lambda p: p["attn_qkv"]["kernel"][:, d:]),
        "bkv": stack(lambda p: p["attn_qkv"]["bias"][d:]),
        "wproj": stack(lambda p: p["attn_proj"]["kernel"]),
        "bproj": stack(lambda p: p["attn_proj"]["bias"]),
        "ln2_g": stack(lambda p: p["norm2"]["scale"]),
        "ln2_b": stack(lambda p: p["norm2"]["bias"]),
        "wfc1": stack(lambda p: p["mlp_fc1"]["kernel"]),
        "bfc1": stack(lambda p: p["mlp_fc1"]["bias"]),
        "wfc2": stack(lambda p: p["mlp_fc2"]["kernel"]),
        "bfc2": stack(lambda p: p["mlp_fc2"]["bias"]),
    }
    w["lnkv_g"] = w["ln1_g"]
    w["lnkv_b"] = w["ln1_b"]
    return w


def run_self_blocks(blocks, x: jax.Array, cfg: ViTConfig, block_impl: str,
                    deterministic: bool, is_initializing: bool,
                    dtype, interpret: bool = False) -> jax.Array:
    """Run a ViTBlock stack: fused Pallas path when eligible, else the
    per-block XLA path (bit-exact canonical semantics). Rematerialization
    is applied at block CONSTRUCTION (nn.remat in the encoders' setup),
    not here."""
    if _use_fused_blocks(block_impl, cfg, is_initializing):
        from mae_clip_tpu.ops.block_kernel import (
            fused_block_stack, fused_block_stack_fwd_xla_bwd)
        # "fwd" = Pallas forward + XLA-autodiff remat backward (the
        # round-3 second fusion strategy; see block_kernel.py).
        fn = (fused_block_stack_fwd_xla_bwd if block_impl == "fwd"
              else fused_block_stack)
        w = collect_self_block_weights(blocks, cfg.dim, dtype)
        return fn(x, x, w, cfg.n_heads, cfg.gelu, False, interpret)
    for block in blocks:
        x = block(x, deterministic)
    return x


class ViTBlock(nn.Module):
    config: ViTConfig
    attn_impl: str = "xla"
    attn_interpret: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.config
        dh = c.dim // c.n_heads
        ln = lambda name: LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        dense = lambda feats, name: Dense(feats, dtype=self.dtype,
                                          param_dtype=self.param_dtype,
                                          name=name)
        # Attention (pre-LN). qkv fused into one matmul like timm; the packed
        # (B, S, 3*H*Dh) output feeds fused_qkv_attention directly — the
        # non-packed impls unpack inside and bit-match the canonical path.
        h = ln("norm1")(x)
        qkv = dense(3 * c.dim, "attn_qkv")(h)
        ctx = fused_qkv_attention(qkv, c.n_heads, sm_scale=1.0 / dh ** 0.5,
                                  impl=self.attn_impl,
                                  interpret=self.attn_interpret)
        x = x + dense(c.dim, "attn_proj")(ctx)

        # MLP (pre-LN).
        h = ln("norm2")(x)
        h = dense(int(c.dim * c.mlp_ratio), "mlp_fc1")(h)
        h = (gelu_exact(h) if c.gelu == "erf"
             else jax.nn.gelu(h, approximate=True))
        h = dense(c.dim, "mlp_fc2")(h)
        h = Dropout(c.dropout, name="mlp_drop")(h, deterministic)
        return x + h


class ViTEncoder(nn.Module):
    """Full-sequence ViT encoder producing a pooled feature vector."""

    config: ViTConfig = VIT_S16
    attn_impl: str = "xla"
    attn_interpret: bool = False
    # Fused Pallas block-stack path ("auto" engages on TPU when the
    # geometry qualifies; see _use_fused_blocks). "off" = canonical
    # per-block XLA path.
    block_impl: str = "off"
    remat: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.patch_embed = PatchEmbed(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        self.cls_token = self.param("cls_token",
                                    nn.initializers.normal(0.02),
                                    (1, 1, c.dim), self.param_dtype)
        if c.pos_embed == "learned":
            self.pos_embed = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, c.num_patches + 1, c.dim), self.param_dtype)
        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock, static_argnums=(2,))
        self.blocks = [block_cls(c, attn_impl=self.attn_impl,
                                 attn_interpret=self.attn_interpret,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"block_{i}")
                       for i in range(c.depth)]
        self.norm = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              param_dtype=self.param_dtype)

    def __call__(self, images: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        c = self.config
        x = self.patch_embed(images)
        b, n, _ = x.shape

        x = jnp.concatenate(
            [jnp.broadcast_to(self.cls_token, (b, 1, c.dim)).astype(x.dtype),
             x], axis=1)
        if c.pos_embed == "learned":
            pe = self.pos_embed
        else:
            pe = jnp.asarray(sincos_pos_embed_2d(c.dim, c.grid_size,
                                                 cls_token=True))[None]
        x = x + pe.astype(x.dtype)

        x = run_self_blocks(self.blocks, x, c, self.block_impl,
                            deterministic, self.is_initializing(),
                            self.dtype, interpret=self.attn_interpret)
        x = self.norm(x)
        if c.pool == "cls":
            return x[:, 0]
        return jnp.mean(x[:, 1:], axis=1)
