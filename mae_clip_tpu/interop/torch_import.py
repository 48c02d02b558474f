"""Import PyTorch ``.pth`` state_dicts into this framework's pytrees.

The reference saves ``torch.save(model.state_dict(), checkpoint_{e}.pth)``
(reference: main.py:118-122) and loads with ``load_state_dict`` (reference:
inference.py:18). This module makes those checkpoints drop in unchanged:

* ``load_pth_state_dict(path)``: unpickle on CPU (torch is only used here and
  in tests; the compute path is pure JAX);
* name-mapping converters for each tower. Layout transpositions:
  - torch ``nn.Linear`` weight is (out, in); our Dense kernel is (in, out);
  - torch conv weight is OIHW; flax expects HWIO;
  - ``nn.LayerNorm``/``nn.BatchNorm`` weight/bias -> scale/bias.

All converters take/return plain nested dicts of numpy arrays, independent of
torch tensor types, so tests can feed state_dicts created in-process.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def load_pth_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch  # local import: torch is not a runtime dependency

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _as_numpy(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# DistilBERT
# ---------------------------------------------------------------------------

def import_distilbert(sd: Mapping[str, Any], prefix: str = "") -> Dict:
    """HF DistilBertModel state_dict -> params for models.distilbert.DistilBertModel."""
    sd = _as_numpy(sd)
    params: Dict = {}
    p = prefix

    _set(params, ("embeddings", "word_embeddings", "embedding"),
         sd[p + "embeddings.word_embeddings.weight"])
    _set(params, ("embeddings", "position_embeddings", "embedding"),
         sd[p + "embeddings.position_embeddings.weight"])
    _set(params, ("embeddings", "LayerNorm", "scale"),
         sd[p + "embeddings.LayerNorm.weight"])
    _set(params, ("embeddings", "LayerNorm", "bias"),
         sd[p + "embeddings.LayerNorm.bias"])

    layer_ids = sorted({int(m.group(1)) for k in sd
                        for m in [re.match(
                            re.escape(p) + r"transformer\.layer\.(\d+)\.", k)]
                        if m})
    for i in layer_ids:
        lp = f"{p}transformer.layer.{i}."
        lname = f"layer_{i}"
        for lin in ("q_lin", "k_lin", "v_lin", "out_lin"):
            _set(params, (lname, "attention", lin, "kernel"),
                 sd[lp + f"attention.{lin}.weight"].T)
            _set(params, (lname, "attention", lin, "bias"),
                 sd[lp + f"attention.{lin}.bias"])
        for ln in ("sa_layer_norm", "output_layer_norm"):
            _set(params, (lname, ln, "scale"), sd[lp + f"{ln}.weight"])
            _set(params, (lname, ln, "bias"), sd[lp + f"{ln}.bias"])
        _set(params, (lname, "ffn_lin1", "kernel"), sd[lp + "ffn.lin1.weight"].T)
        _set(params, (lname, "ffn_lin1", "bias"), sd[lp + "ffn.lin1.bias"])
        _set(params, (lname, "ffn_lin2", "kernel"), sd[lp + "ffn.lin2.weight"].T)
        _set(params, (lname, "ffn_lin2", "bias"), sd[lp + "ffn.lin2.bias"])
    return params


# ---------------------------------------------------------------------------
# ProjectionHead (reference: modules.py:55-76)
# ---------------------------------------------------------------------------

def import_projection_head(sd: Mapping[str, Any], prefix: str = "") -> Dict:
    sd = _as_numpy(sd)
    p = prefix
    return {
        "projection": {"kernel": sd[p + "projection.weight"].T,
                       "bias": sd[p + "projection.bias"]},
        "fc": {"kernel": sd[p + "fc.weight"].T, "bias": sd[p + "fc.bias"]},
        "layer_norm": {"scale": sd[p + "layer_norm.weight"],
                       "bias": sd[p + "layer_norm.bias"]},
    }


# ---------------------------------------------------------------------------
# ResNet50 (timm/torchvision layout)
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def import_resnet50(sd: Mapping[str, Any], prefix: str = ""
                    ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for models.resnet.ResNet."""
    sd = _as_numpy(sd)
    p = prefix
    params: Dict = {}
    stats: Dict = {}

    def put_conv(tree_path, torch_name):
        _set(params, tree_path + ("kernel",), _conv_kernel(sd[torch_name]))

    def put_bn(tree_path, torch_name):
        _set(params, tree_path + ("scale",), sd[torch_name + ".weight"])
        _set(params, tree_path + ("bias",), sd[torch_name + ".bias"])
        _set(stats, tree_path + ("mean",), sd[torch_name + ".running_mean"])
        _set(stats, tree_path + ("var",), sd[torch_name + ".running_var"])

    put_conv(("conv1",), p + "conv1.weight")
    put_bn(("bn1",), p + "bn1")
    stage_sizes = (3, 4, 6, 3)
    for stage, size in enumerate(stage_sizes, start=1):
        for block in range(size):
            tname = f"{p}layer{stage}.{block}."
            bname = f"layer{stage}_{block}"
            for conv in ("conv1", "conv2", "conv3"):
                put_conv((bname, conv), tname + conv + ".weight")
                put_bn((bname, conv.replace("conv", "bn")),
                       tname + conv.replace("conv", "bn"))
            if block == 0:
                put_conv((bname, "downsample_conv"),
                         tname + "downsample.0.weight")
                put_bn((bname, "downsample_bn"), tname + "downsample.1")
    return params, stats


# ---------------------------------------------------------------------------
# timm ViT (the reference's commented-out tower, modules.py:20-26:
# 'vit_base_patch16_224...' with num_classes=0)
# ---------------------------------------------------------------------------

def import_timm_vit(sd: Mapping[str, Any], prefix: str = "") -> Dict:
    """timm VisionTransformer state_dict -> params for models.vit.ViTEncoder.

    Layout notes: timm's conv patch embed (D, C, P, P) becomes our
    patchify-matmul kernel (P*P*C, D) via (D,C,P,P) -> (D,P,P,C) -> flatten
    -> transpose, matching the (row, col, channel) patch vector order of
    models.vit.patchify. Fused qkv stays fused (our attn_qkv)."""
    sd = _as_numpy(sd)
    p = prefix
    params: Dict = {}

    _set(params, ("cls_token",), sd[p + "cls_token"])
    if p + "pos_embed" in sd:
        _set(params, ("pos_embed",), sd[p + "pos_embed"])

    w = sd[p + "patch_embed.proj.weight"]           # (D, C, P, P)
    kernel = np.transpose(w, (0, 2, 3, 1)).reshape(w.shape[0], -1).T
    _set(params, ("patch_embed", "proj", "kernel"), kernel)
    _set(params, ("patch_embed", "proj", "bias"),
         sd[p + "patch_embed.proj.bias"])

    i = 0
    while f"{p}blocks.{i}.norm1.weight" in sd:
        bp = f"{p}blocks.{i}."
        bn = f"block_{i}"
        for ln_t, ln_o in (("norm1", "norm1"), ("norm2", "norm2")):
            _set(params, (bn, ln_o, "scale"), sd[bp + f"{ln_t}.weight"])
            _set(params, (bn, ln_o, "bias"), sd[bp + f"{ln_t}.bias"])
        _set(params, (bn, "attn_qkv", "kernel"), sd[bp + "attn.qkv.weight"].T)
        _set(params, (bn, "attn_qkv", "bias"), sd[bp + "attn.qkv.bias"])
        _set(params, (bn, "attn_proj", "kernel"),
             sd[bp + "attn.proj.weight"].T)
        _set(params, (bn, "attn_proj", "bias"), sd[bp + "attn.proj.bias"])
        _set(params, (bn, "mlp_fc1", "kernel"), sd[bp + "mlp.fc1.weight"].T)
        _set(params, (bn, "mlp_fc1", "bias"), sd[bp + "mlp.fc1.bias"])
        _set(params, (bn, "mlp_fc2", "kernel"), sd[bp + "mlp.fc2.weight"].T)
        _set(params, (bn, "mlp_fc2", "bias"), sd[bp + "mlp.fc2.bias"])
        i += 1

    _set(params, ("norm", "scale"), sd[p + "norm.weight"])
    _set(params, ("norm", "bias"), sd[p + "norm.bias"])
    return params


# ---------------------------------------------------------------------------
# Full reference CLIPModel state_dict (reference: CLIP.py:9-21)
# ---------------------------------------------------------------------------

def import_clip_state_dict(sd: Mapping[str, Any], model_name: str = "resnet50"
                           ) -> Dict:
    """Reference ``CLIPModel().state_dict()`` -> flax variables dict.

    Reference module tree: ``image_encoder.model.*`` (timm tower),
    ``text_encoder.model.*`` (HF DistilBERT), ``image_projection.*``,
    ``text_projection.*``.
    """
    sd = _as_numpy(sd)
    params: Dict = {}
    collections: Dict = {}

    if model_name == "resnet50":
        rn_params, rn_stats = import_resnet50(sd, prefix="image_encoder.model.")
        params["image_encoder"] = rn_params
        collections["batch_stats"] = {"image_encoder": rn_stats}
    elif model_name.startswith("vit"):
        params["image_encoder"] = import_timm_vit(
            sd, prefix="image_encoder.model.")
    else:
        raise NotImplementedError(f"importer for image tower {model_name!r}")

    params["text_encoder"] = {
        "model": import_distilbert(sd, prefix="text_encoder.model.")}
    params["image_projection"] = import_projection_head(
        sd, prefix="image_projection.")
    params["text_projection"] = import_projection_head(
        sd, prefix="text_projection.")

    out = {"params": params}
    out.update(collections)
    return out
