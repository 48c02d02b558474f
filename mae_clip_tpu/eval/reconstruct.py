"""MAE reconstruction visualization (the MAE paper's hallmark figures).

Produces, per image: the original, the masked input (masked patches
blanked), and the composite reconstruction (visible patches from the
original + model predictions on the masked positions) — arXiv:2111.06377
Fig. 2. The reference repo has nothing comparable (no MAE at all); its
only visualization is the retrieval image grid (reference
inference.py:49-56), which ``eval.retrieval.show_matches`` covers.

Works with both decoder styles: 'full' predicts every position; 'cross'
predicts only the masked ones, which are scattered back via the same
masking the model derived from ``mask_rng`` (deterministic in the rng, so
recomputing it here matches the model's masking exactly).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mae_clip_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
from mae_clip_tpu.models.vit import patchify, unpatchify
from mae_clip_tpu.ops.masking import random_masking


def mae_reconstructions(model, variables, images: jax.Array,
                        mask_rng: jax.Array, norm_pix: bool = True
                        ) -> Dict[str, np.ndarray]:
    """Run a MAEViT and compose the paper-style visualization tensors.

    Args:
      model: a ``MAEViT`` (e.g. ``models.clip.mae_vit_for(cfg)``).
      variables: its params (a CLIP checkpoint's ``image_encoder`` subtree
        works — same tree; see ``interop.transfer``).
      images: (B, H, W, C) float images, ImageNet-normalized (the
        pipeline's output layout).
      mask_rng: the masking key; any key gives a valid 75% mask.
      norm_pix: must match the training loss's ``norm_pix`` (the decoder
        then predicts per-patch-standardized pixels, which are un-
        standardized here with the target patch stats — paper protocol).

    Returns {original, masked, reconstructed}: (B, H, W, C) float arrays
    in [0, 1] display space.
    """
    c = model.config
    p = c.patch_size
    out = model.apply(variables, images, mask_rng)

    target = patchify(images, p).astype(jnp.float32)      # (B, N, PPC)
    b, n, _ = target.shape
    masking = random_masking(mask_rng, b, n, model.mask_ratio)
    mask = masking.mask[:, :, None]                        # 1 = masked

    pred = out.pred_patches.astype(jnp.float32)
    if pred.shape[1] != n:   # 'cross' decoder: masked positions only
        full = jnp.zeros_like(target)
        pred = full.at[
            jnp.arange(b)[:, None], masking.ids_masked].set(pred)
    if norm_pix:
        # Invert the per-patch standardization with TARGET stats
        # (arXiv:2111.06377 §A.3 visualization protocol).
        mean = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True)
        pred = pred * jnp.sqrt(var + 1e-6) + mean

    composite = target * (1.0 - mask) + pred * mask
    masked_vis = target * (1.0 - mask)

    def to_display(patches):
        imgs = unpatchify(patches, p, channels=images.shape[-1])
        imgs = np.asarray(imgs) * IMAGENET_STD + IMAGENET_MEAN
        return np.clip(imgs, 0.0, 1.0)

    return {"original": to_display(target),
            "masked": to_display(masked_vis),
            "reconstructed": to_display(composite)}


def save_reconstruction_grid(recon: Dict[str, np.ndarray],
                             path: str, max_rows: int = 8) -> None:
    """Rows = images; columns = original | masked | reconstructed."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = min(len(recon["original"]), max_rows)
    fig, axes = plt.subplots(rows, 3, figsize=(9, 3 * rows), squeeze=False)
    for r in range(rows):
        for ci, key in enumerate(("original", "masked", "reconstructed")):
            ax = axes[r][ci]
            ax.imshow(recon[key][r])
            ax.set_axis_off()
            if r == 0:
                ax.set_title(key)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
