"""Contrastive and reconstruction losses.

``clip_soft_ce_loss`` reproduces the reference loss exactly (reference:
CLIP.py:34-43,46-52), including its quirks:

* soft targets ``softmax((img@img.T + txt@txt.T)/2 * T)`` that RECEIVE
  gradients (the reference never detaches them);
* embeddings are NOT L2-normalized in the training loss (normalization only
  happens at inference, reference: inference.py:42-43);
* the temperature asymmetry: logits are divided by T while targets are
  multiplied by T;
* ``loss = mean((images_loss + texts_loss) / 2)`` over the batch.

TPU needs static shapes, so the ragged final batch (the reference's
DataLoader has no ``drop_last``, reference: main.py:42-47) is padded and a
``valid`` mask excludes pad rows/columns from softmaxes and from the mean,
keeping metric parity with the reference's count-weighted averaging.

``global_clip_soft_ce_loss`` is the mesh-scaled version: embeddings are
all-gathered over the ``data`` axis (XLA lowers this to ICI collectives) so
the logits become global_B x global_B while each shard only materializes its
local rows. Gradients flow through ``jax.lax.all_gather`` (its transpose is
``psum_scatter``), so no custom VJP is needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Large-but-finite mask value: finfo.min overflows to -inf once the row max
# is subtracted inside softmax, and 0 * -inf = nan poisons the soft-CE sum.
_NEG_INF = -1e30


def _masked_log_softmax(logits: jax.Array, col_valid: Optional[jax.Array]
                        ) -> jax.Array:
    """log_softmax over the last axis with invalid columns excluded."""
    if col_valid is not None:
        logits = jnp.where(col_valid[None, :], logits, _NEG_INF)
    return jax.nn.log_softmax(logits, axis=-1)


def _masked_softmax(logits: jax.Array, col_valid: Optional[jax.Array]
                    ) -> jax.Array:
    if col_valid is not None:
        logits = jnp.where(col_valid[None, :], logits, _NEG_INF)
        return jnp.where(col_valid[None, :],
                         jax.nn.softmax(logits, axis=-1), 0.0)
    return jax.nn.softmax(logits, axis=-1)


def _soft_ce_rows(logits: jax.Array, targets: jax.Array,
                  col_valid: Optional[jax.Array]) -> jax.Array:
    """Row-wise soft cross-entropy with invalid columns contributing zero."""
    logp = _masked_log_softmax(logits, col_valid)
    terms = -targets * logp
    if col_valid is not None:
        terms = jnp.where(col_valid[None, :], terms, 0.0)
    return jnp.sum(terms, axis=-1)


def clip_soft_ce_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Soft-target symmetric InfoNCE, exact reference math (CLIP.py:34-43).

    Args:
      image_embeddings: (B, D) projected image embeddings (unnormalized).
      text_embeddings: (B, D) projected text embeddings (unnormalized).
      temperature: the reference's ``CFG.temperature``.
      valid: optional (B,) bool mask; False rows are padding.

    Returns:
      Scalar mean loss over valid rows.
    """
    img = image_embeddings.astype(jnp.float32)
    txt = text_embeddings.astype(jnp.float32)

    logits = jnp.matmul(txt, img.T, preferred_element_type=jnp.float32)
    logits = logits / temperature
    images_similarity = jnp.matmul(img, img.T, preferred_element_type=jnp.float32)
    texts_similarity = jnp.matmul(txt, txt.T, preferred_element_type=jnp.float32)
    targets = _masked_softmax(
        (images_similarity + texts_similarity) / 2 * temperature, valid)

    texts_loss = _soft_ce_rows(logits, targets, valid)
    images_loss = _soft_ce_rows(logits.T, targets.T, valid)
    per_row = (images_loss + texts_loss) / 2.0
    if valid is None:
        return jnp.mean(per_row)
    per_row = jnp.where(valid, per_row, 0.0)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(valid), 1)


def global_clip_soft_ce_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
) -> jax.Array:
    """Global-batch version of :func:`clip_soft_ce_loss` for use inside
    ``shard_map``/``pjit`` over a mesh ``data`` axis.

    Each shard holds (B_local, D) embeddings. Both embedding sets are
    all-gathered so the effective contrastive batch is global_B = B_local *
    axis_size. Each shard materializes only its local rows of the global
    logits (B_local x global_B) plus one gathered (global_B,) logsumexp
    vector needed for the transposed (image-side) loss. The result equals
    :func:`clip_soft_ce_loss` on the concatenated global batch bit-for-bit
    up to fp reduction order.
    """
    img = image_embeddings.astype(jnp.float32)
    txt = text_embeddings.astype(jnp.float32)
    b_local = img.shape[0]
    if valid is None:
        valid = jnp.ones((b_local,), dtype=bool)

    g_img = jax.lax.all_gather(img, axis_name, tiled=True)     # (GB, D)
    g_txt = jax.lax.all_gather(txt, axis_name, tiled=True)     # (GB, D)
    g_valid = jax.lax.all_gather(valid, axis_name, tiled=True)  # (GB,)

    t = temperature
    # Local text rows of the global logits / similarity matrices.
    logits_rows = jnp.matmul(txt, g_img.T, preferred_element_type=jnp.float32) / t
    sim_rows = (jnp.matmul(img, g_img.T, preferred_element_type=jnp.float32)
                + jnp.matmul(txt, g_txt.T, preferred_element_type=jnp.float32)
                ) / 2 * t

    sim_rows_m = jnp.where(g_valid[None, :], sim_rows, _NEG_INF)
    targets_rows = jnp.where(g_valid[None, :],
                             jax.nn.softmax(sim_rows_m, axis=-1), 0.0)
    texts_loss = _soft_ce_rows(logits_rows, targets_rows, g_valid)

    # Image-side loss needs COLUMNS of the global targets matrix: entry
    # (j, i) = exp(sim[j, i] - logsumexp_j). The row normalizers are global,
    # so gather the local (B_local,) logsumexp vector into (GB,).
    row_lse = jax.nn.logsumexp(sim_rows_m, axis=-1)              # (Bl,)
    g_row_lse = jax.lax.all_gather(row_lse, axis_name, tiled=True)  # (GB,)

    # sim columns for local images: (GB, Bl); entry (j, i) = sim[j, i].
    sim_cols = (jnp.matmul(g_img, img.T, preferred_element_type=jnp.float32)
                + jnp.matmul(g_txt, txt.T, preferred_element_type=jnp.float32)
                ) / 2 * t
    sim_cols = jnp.where(valid[None, :], sim_cols, _NEG_INF)
    targets_cols = jnp.exp(sim_cols - g_row_lse[:, None])        # (GB, Bl)
    targets_cols = jnp.where(g_valid[:, None], targets_cols, 0.0)

    # logits.T local rows: (Bl, GB); entry (i, j) = img_i . txt_j / T.
    logitsT_rows = jnp.matmul(img, g_txt.T, preferred_element_type=jnp.float32) / t
    images_loss = _soft_ce_rows(logitsT_rows, targets_cols.T, g_valid)

    per_row = (images_loss + texts_loss) / 2.0
    per_row = jnp.where(valid, per_row, 0.0)
    local_sum = jnp.sum(per_row)
    global_sum = jax.lax.psum(local_sum, axis_name)
    global_count = jax.lax.psum(jnp.sum(valid.astype(jnp.float32)), axis_name)
    return global_sum / jnp.maximum(global_count, 1.0)


def mae_reconstruction_loss(
    pred_patches: jax.Array,
    target_patches: jax.Array,
    mask: jax.Array,
    norm_pix: bool = True,
) -> jax.Array:
    """Pixel-MSE over MASKED patches only (MAE objective; He et al. 2021).

    Args:
      pred_patches: (B, N, P) decoder predictions per patch.
      target_patches: (B, N, P) patchified input pixels.
      mask: (B, N) float/bool; 1 where the patch was masked (to reconstruct).
      norm_pix: normalize each target patch to zero mean / unit var first.
    """
    target = target_patches.astype(jnp.float32)
    pred = pred_patches.astype(jnp.float32)
    if norm_pix:
        mean = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean(jnp.square(pred - target), axis=-1)    # (B, N)
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy_soft(preds: jax.Array, targets: jax.Array,
                       reduction: str = "none") -> jax.Array:
    """Row-wise soft cross-entropy, mirroring reference CLIP.py:46-52."""
    loss = jnp.sum(-targets * jax.nn.log_softmax(preds, axis=-1), axis=1)
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    raise ValueError(f"unknown reduction {reduction!r}")
