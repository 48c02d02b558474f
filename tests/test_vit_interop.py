"""ViT tower parity vs a torch oracle of timm's VisionTransformer math."""

import numpy as np
import jax.numpy as jnp
import torch
from torch import nn

from mae_clip_tpu.interop.torch_import import import_timm_vit
from mae_clip_tpu.models.vit import ViTConfig, ViTEncoder


class TorchTimmBlock(nn.Module):
    """timm ViT block math: pre-LN, fused qkv, q-scaled attention, erf GELU."""

    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        dh = d // h
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * dh ** -0.5, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchTimmViT(nn.Module):
    """State_dict-compatible mini timm ViT (num_classes=0, token pooling)."""

    def __init__(self, img=32, patch=8, dim=24, depth=2, heads=3):
        super().__init__()
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim).normal_(0, 0.02))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, n + 1, dim).normal_(0, 0.02))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.blocks = nn.Sequential(
            *[TorchTimmBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # x: (B, C, H, W)
        y = self.patch_embed.proj(x)                    # (B, D, gh, gw)
        y = y.flatten(2).transpose(1, 2)                # (B, N, D) row-major
        cls = self.cls_token.expand(y.shape[0], -1, -1)
        y = torch.cat([cls, y], dim=1) + self.pos_embed
        for blk in self.blocks:
            y = blk(y)
        y = self.norm(y)
        return y[:, 0]                                  # token pooling


def test_vit_encoder_matches_timm_oracle():
    torch.manual_seed(0)
    oracle = TorchTimmViT().eval()
    params = import_timm_vit(oracle.state_dict())

    cfg = ViTConfig(image_size=32, patch_size=8, dim=24, depth=2, n_heads=3,
                    pos_embed="learned", pool="cls")
    model = ViTEncoder(cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expected = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = model.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5,
                               rtol=1e-4)
