"""Export framework params back to reference-layout ``.pth`` state_dicts.

Inverse of interop/torch_import.py: produces a state_dict with the
reference composite's exact key names (reference CLIP.py:17-21 module tree:
``image_encoder.model.*`` / ``text_encoder.model.*`` / ``*_projection.*``),
so checkpoints trained here can be loaded by the reference's
``model.load_state_dict`` (reference inference.py:18) or by any torch
tooling. Round-trip (export -> import) is tested to be exact.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _get(tree: Mapping, *path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def export_projection_head(params: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        prefix + "projection.weight": _get(params, "projection", "kernel").T,
        prefix + "projection.bias": _get(params, "projection", "bias"),
        prefix + "fc.weight": _get(params, "fc", "kernel").T,
        prefix + "fc.bias": _get(params, "fc", "bias"),
        prefix + "layer_norm.weight": _get(params, "layer_norm", "scale"),
        prefix + "layer_norm.bias": _get(params, "layer_norm", "bias"),
    }


def export_distilbert(params: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    sd = {
        prefix + "embeddings.word_embeddings.weight":
            _get(params, "embeddings", "word_embeddings", "embedding"),
        prefix + "embeddings.position_embeddings.weight":
            _get(params, "embeddings", "position_embeddings", "embedding"),
        prefix + "embeddings.LayerNorm.weight":
            _get(params, "embeddings", "LayerNorm", "scale"),
        prefix + "embeddings.LayerNorm.bias":
            _get(params, "embeddings", "LayerNorm", "bias"),
    }
    i = 0
    while f"layer_{i}" in params:
        lp = f"{prefix}transformer.layer.{i}."
        layer = params[f"layer_{i}"]
        for lin in ("q_lin", "k_lin", "v_lin", "out_lin"):
            sd[lp + f"attention.{lin}.weight"] = _get(
                layer, "attention", lin, "kernel").T
            sd[lp + f"attention.{lin}.bias"] = _get(
                layer, "attention", lin, "bias")
        for ln in ("sa_layer_norm", "output_layer_norm"):
            sd[lp + f"{ln}.weight"] = _get(layer, ln, "scale")
            sd[lp + f"{ln}.bias"] = _get(layer, ln, "bias")
        sd[lp + "ffn.lin1.weight"] = _get(layer, "ffn_lin1", "kernel").T
        sd[lp + "ffn.lin1.bias"] = _get(layer, "ffn_lin1", "bias")
        sd[lp + "ffn.lin2.weight"] = _get(layer, "ffn_lin2", "kernel").T
        sd[lp + "ffn.lin2.bias"] = _get(layer, "ffn_lin2", "bias")
        i += 1
    return sd


def export_resnet50(params: Mapping, batch_stats: Mapping, prefix: str
                    ) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def put_conv(torch_name, *path):
        sd[torch_name] = np.transpose(_get(params, *path, "kernel"),
                                      (3, 2, 0, 1))  # HWIO -> OIHW

    def put_bn(torch_name, *path):
        sd[torch_name + ".weight"] = _get(params, *path, "scale")
        sd[torch_name + ".bias"] = _get(params, *path, "bias")
        sd[torch_name + ".running_mean"] = _get(batch_stats, *path, "mean")
        sd[torch_name + ".running_var"] = _get(batch_stats, *path, "var")
        sd[torch_name + ".num_batches_tracked"] = np.asarray(0)

    put_conv(prefix + "conv1.weight", "conv1")
    put_bn(prefix + "bn1", "bn1")
    for stage, size in enumerate((3, 4, 6, 3), start=1):
        for block in range(size):
            t = f"{prefix}layer{stage}.{block}."
            b = f"layer{stage}_{block}"
            for conv in ("conv1", "conv2", "conv3"):
                put_conv(t + conv + ".weight", b, conv)
                put_bn(t + conv.replace("conv", "bn"), b,
                       conv.replace("conv", "bn"))
            if block == 0:
                put_conv(t + "downsample.0.weight", b, "downsample_conv")
                put_bn(t + "downsample.1", b, "downsample_bn")
    return sd


def export_timm_vit(params, prefix: str = "",
                    sincos_grid: int = 0,
                    channels: int = 3) -> Dict[str, np.ndarray]:
    """ViT encoder params -> timm VisionTransformer state_dict.

    Exact inverse of ``torch_import.import_timm_vit`` (same layout notes:
    our patchify-matmul kernel (P*P*C, D) becomes timm's conv weight
    (D, C, P, P)). Encoders trained with fixed sincos positions (the MAE
    tower) have no ``pos_embed`` param; pass ``sincos_grid`` to materialize
    the sincos table under the ``pos_embed`` key so the dict strict-loads
    into timm/torch ViTs.
    """
    p = prefix
    sd: Dict[str, np.ndarray] = {}
    sd[p + "cls_token"] = _get(params, "cls_token")

    kernel = _get(params, "patch_embed", "proj", "kernel")  # (P*P*C, D)
    dim = kernel.shape[1]
    patch = int(round((kernel.shape[0] // channels) ** 0.5))
    w = kernel.T.reshape(dim, patch, patch, channels)
    sd[p + "patch_embed.proj.weight"] = np.transpose(w, (0, 3, 1, 2))
    sd[p + "patch_embed.proj.bias"] = _get(params, "patch_embed", "proj",
                                           "bias")

    if "pos_embed" in params:
        sd[p + "pos_embed"] = _get(params, "pos_embed")
    elif sincos_grid:
        from mae_clip_tpu.models.vit import sincos_pos_embed_2d
        sd[p + "pos_embed"] = sincos_pos_embed_2d(
            dim, sincos_grid, cls_token=True)[None].astype(np.float32)

    i = 0
    while f"block_{i}" in params:
        b = params[f"block_{i}"]
        bp = f"{p}blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[bp + f"{ln}.weight"] = _get(b, ln, "scale")
            sd[bp + f"{ln}.bias"] = _get(b, ln, "bias")
        sd[bp + "attn.qkv.weight"] = _get(b, "attn_qkv", "kernel").T
        sd[bp + "attn.qkv.bias"] = _get(b, "attn_qkv", "bias")
        sd[bp + "attn.proj.weight"] = _get(b, "attn_proj", "kernel").T
        sd[bp + "attn.proj.bias"] = _get(b, "attn_proj", "bias")
        sd[bp + "mlp.fc1.weight"] = _get(b, "mlp_fc1", "kernel").T
        sd[bp + "mlp.fc1.bias"] = _get(b, "mlp_fc1", "bias")
        sd[bp + "mlp.fc2.weight"] = _get(b, "mlp_fc2", "kernel").T
        sd[bp + "mlp.fc2.bias"] = _get(b, "mlp_fc2", "bias")
        i += 1

    sd[p + "norm.weight"] = _get(params, "norm", "scale")
    sd[p + "norm.bias"] = _get(params, "norm", "bias")
    return sd


def export_mae_encoder_to_timm(mae_params, grid_size: int,
                               prefix: str = "") -> Dict[str, np.ndarray]:
    """Standalone MAEViT pretraining params -> timm ViT state_dict.

    The MAE workflow's torch-facing exit: after image-only pretraining
    (``cli mae-pretrain``), the encoder (patch embed, blocks, final norm,
    cls token — the decoder is pretraining-only scaffolding, dropped like
    the MAE paper does for transfer) becomes a standard timm
    VisionTransformer state_dict with materialized sincos positions.
    """
    encoder = {k: v for k, v in mae_params.items()
               if k in ("cls_token", "norm", "patch_embed")
               or k.startswith("block_")}
    return export_timm_vit(encoder, prefix=prefix, sincos_grid=grid_size)


def export_clip_state_dict(variables: Mapping, model_name: str = "resnet50",
                           grid_size: int = 0) -> Dict[str, np.ndarray]:
    """Flax variables -> reference-layout state_dict (numpy arrays).

    ``resnet50`` is the layout the reference actually shipped
    (inference.py:18); ViT towers export under the same
    ``image_encoder.model.`` prefix with timm VisionTransformer names —
    the layout the reference's commented-out ViT variant (modules.py:20-26)
    would have produced. For sincos-position encoders (the MAE tower) pass
    ``grid_size`` to materialize ``pos_embed``; a MAE-capable tower drops
    its decoder (pretraining-only scaffolding, as the MAE paper does for
    transfer).
    """
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    if model_name == "resnet50":
        sd.update(export_resnet50(params["image_encoder"],
                                  variables["batch_stats"]["image_encoder"],
                                  "image_encoder.model."))
    elif model_name.startswith("vit"):
        tower = params["image_encoder"]
        encoder_keys = ("cls_token", "norm", "patch_embed", "pos_embed")
        if any(k not in encoder_keys and not k.startswith("block_")
               for k in tower):
            tower = {k: v for k, v in tower.items()
                     if k in encoder_keys or k.startswith("block_")}
        sd.update(export_timm_vit(tower, "image_encoder.model.",
                                  sincos_grid=grid_size))
    else:
        raise NotImplementedError(f"export for image tower {model_name!r}")
    sd.update(export_distilbert(params["text_encoder"]["model"],
                                "text_encoder.model."))
    sd.update(export_projection_head(params["image_projection"],
                                     "image_projection."))
    sd.update(export_projection_head(params["text_projection"],
                                     "text_projection."))
    return sd


def save_pth(state_dict: Mapping[str, np.ndarray], path: str) -> None:
    import torch

    torch.save({k: torch.tensor(np.asarray(v)) for k, v in
                state_dict.items()}, path)
