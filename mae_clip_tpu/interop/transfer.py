"""Parameter transfer between this framework's own models.

The MAE-paper workflow (He et al., arXiv:2111.06377) is pretrain-then-
transfer: the MAE encoder initializes a downstream image tower. The
reference repo names this intent ("Training CLIP with MAE", reference
README.md:2) but never ships it; here it is first-class:

    mae = mae_vit_for(cfg)                      # models.clip
    ... pretrain with train.loop.make_mae_pretrain_step ...
    clip_params = load_mae_encoder_into_clip(clip_variables["params"],
                                             mae_state.params)[0]

``mae_vit_for`` builds the standalone MAEViT with the same parameter tree
as the tower ``CLIPModel`` embeds, so the transfer is a pure path-wise
intersection copy — it works both for a MAE-enabled CLIP tower (every leaf
matches, decoder included) and for a plain ViTEncoder tower (encoder
leaves match; decoder leaves are reported as skipped).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple


def merge_intersecting(src: Mapping[str, Any], dst: Mapping[str, Any]
                       ) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Copy ``src`` leaves into ``dst`` wherever the path exists in both
    AND the shapes agree; ``dst``-only leaves keep their values.

    Returns ``(merged, transferred, skipped)``; ``skipped`` lists src paths
    that had no shape-compatible destination (e.g. decoder params when the
    destination tower has no decoder).
    """
    transferred: List[str] = []
    skipped: List[str] = []

    def rec(s, d, path):
        if isinstance(s, Mapping) and isinstance(d, Mapping):
            out = dict(d)
            for k, sv in s.items():
                if k in d:
                    out[k] = rec(sv, d[k], path + (k,))
                else:
                    _collect(sv, path + (k,), skipped)
            return out
        if (not isinstance(s, Mapping) and not isinstance(d, Mapping)
                and getattr(s, "shape", None) == getattr(d, "shape", None)):
            transferred.append("/".join(path))
            return s.astype(d.dtype) if hasattr(s, "astype") else s
        _collect(s, path, skipped)
        return d

    merged = rec(src, dst, ())
    return merged, transferred, skipped


def _collect(tree, path, into: List[str]) -> None:
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            _collect(v, path + (k,), into)
    else:
        into.append("/".join(path))


def load_mae_encoder_into_clip(clip_params: Mapping[str, Any],
                               mae_params: Mapping[str, Any]
                               ) -> Tuple[Dict[str, Any], List[str],
                                          List[str]]:
    """Initialize a CLIPModel's ``image_encoder`` scope from standalone
    MAEViT pretraining params. Returns (new_clip_params, transferred paths,
    skipped paths — both relative to the image_encoder scope)."""
    if "image_encoder" not in clip_params:
        raise ValueError("clip_params has no 'image_encoder' scope")
    merged, transferred, skipped = merge_intersecting(
        mae_params, clip_params["image_encoder"])
    out = dict(clip_params)
    out["image_encoder"] = merged
    return out, transferred, skipped
