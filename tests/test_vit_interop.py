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


def test_export_timm_vit_roundtrip_and_torch_load():
    """export_timm_vit is the exact inverse of import_timm_vit, and the
    exported dict strict-loads into the torch oracle with identical
    forward outputs."""
    from mae_clip_tpu.interop.torch_export import export_timm_vit

    torch.manual_seed(1)
    oracle = TorchTimmViT().eval()
    params = import_timm_vit(oracle.state_dict())
    sd = export_timm_vit(params)

    # Key-for-key exact roundtrip.
    want = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(sd[k]), want[k])

    # Strict-loads into a fresh torch module; same forward.
    other = TorchTimmViT().eval()
    other.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    x = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        np.testing.assert_array_equal(oracle(torch.tensor(x)).numpy(),
                                      other(torch.tensor(x)).numpy())


def test_export_mae_encoder_to_timm():
    """MAE-pretrained encoder exports to a timm dict whose torch forward
    matches our encode_full pass (sincos positions materialized; decoder
    dropped)."""
    import jax
    from mae_clip_tpu.interop.torch_export import export_mae_encoder_to_timm
    from mae_clip_tpu.models.mae import MAEDecoderConfig, MAEViT

    cfg = ViTConfig(image_size=32, patch_size=8, dim=24, depth=2, n_heads=3,
                    pos_embed="sincos", pool="cls")
    model = MAEViT(cfg, decoder=MAEDecoderConfig(dim=16, depth=1, n_heads=4),
                   mask_ratio=0.75)
    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jax.random.PRNGKey(1))

    sd = export_mae_encoder_to_timm(variables["params"], grid_size=4)
    assert not any("decoder" in k or "mask_token" in k for k in sd)

    torch_vit = TorchTimmViT(img=32, patch=8, dim=24, depth=2, heads=3)
    torch_vit.load_state_dict({k: torch.tensor(np.asarray(v))
                               for k, v in sd.items()}, strict=True)
    torch_vit.eval()
    with torch.no_grad():
        expected = torch_vit(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = model.apply(variables, jnp.asarray(x),
                      method=model.encode_full)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5,
                               rtol=1e-4)


def test_export_clip_composite_with_vit_tower():
    """Composite .pth export for ViT towers (the reference's commented-out
    variant, modules.py:20-26): reference prefixes + timm names, exact
    import_clip_state_dict roundtrip, and a MAE tower drops its decoder."""
    import jax
    from mae_clip_tpu.config import Config, MAEConfig
    from mae_clip_tpu.interop.torch_export import export_clip_state_dict
    from mae_clip_tpu.interop.torch_import import import_clip_state_dict
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig

    text_cfg = DistilBertConfig(vocab_size=64, dim=16, n_layers=1, n_heads=2,
                                hidden_dim=32, max_position_embeddings=32)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                        n_heads=2, pos_embed="learned")
    rng = np.random.default_rng(0)
    batch = {"image": jnp.array(rng.normal(size=(2, 16, 16, 3)).astype(np.float32)),
             "input_ids": jnp.array(rng.integers(0, 64, (2, 8)).astype(np.int32)),
             "attention_mask": jnp.ones((2, 8), dtype=jnp.int32)}

    cfg = Config(model_name="vit_s16", image_embedding=16, projection_dim=8,
                 size=16, compute_dtype="float32", max_length=8)
    model = CLIPModel(cfg, text_config=text_cfg, vit_config=vit_cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    sd = export_clip_state_dict(variables, model_name="vit_s16")
    assert any(k.startswith("image_encoder.model.blocks.0.") for k in sd)
    assert "image_encoder.model.pos_embed" in sd

    back = import_clip_state_dict(sd, model_name="vit_s16")
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(back["params"])}
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_b[jax.tree_util.keystr(p)]),
                                      err_msg=jax.tree_util.keystr(p))

    # MAE-capable tower: decoder params are dropped, encoder exports with
    # materialized sincos positions.
    cfg_m = cfg.replace(mae=MAEConfig(enabled=True, mask_ratio=0.5,
                                      decoder_dim=16, decoder_depth=1,
                                      decoder_heads=2))
    vit_sincos = ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                           n_heads=2, pos_embed="sincos")
    model_m = CLIPModel(cfg_m, text_config=text_cfg, vit_config=vit_sincos)
    var_m = model_m.init(jax.random.PRNGKey(0), batch,
                         mask_rng=jax.random.PRNGKey(1))
    sd_m = export_clip_state_dict(var_m, model_name="vit_s16", grid_size=2)
    assert "image_encoder.model.pos_embed" in sd_m
    assert not any("decoder" in k or "mask_token" in k for k in sd_m)
    assert any(k.startswith("image_encoder.model.blocks.0.") for k in sd_m)
