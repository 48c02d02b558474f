"""MAE random masking with static shapes.

TPU/XLA require static shapes, so "drop 75% of patches" is implemented as the
MAE paper's argsort-of-random-keys trick: per sample, draw uniform noise over
the N patches, argsort it, keep the first ``len_keep`` indices (a fixed
count), and remember the inverse permutation to restore order in the decoder.
No dynamic shapes, no host round-trips; the gathers lower to efficient XLA
``gather``s on TPU.

The reference never shipped MAE (see reference modules.py:20-26 for the
stub); this implements the capability its name promises.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MaskingResult(NamedTuple):
    ids_keep: jax.Array     # (B, len_keep) indices of visible patches
    ids_restore: jax.Array  # (B, N) inverse permutation
    mask: jax.Array         # (B, N) float; 1 = masked (to reconstruct)
    ids_masked: jax.Array   # (B, N - len_keep) indices of masked patches


def random_masking(rng: jax.Array, batch: int, num_patches: int,
                   mask_ratio: float) -> MaskingResult:
    len_keep = int(num_patches * (1.0 - mask_ratio))
    noise = jax.random.uniform(rng, (batch, num_patches))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((batch, num_patches))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return MaskingResult(ids_keep, ids_restore, mask,
                         ids_shuffle[:, len_keep:])


def gather_patches_onehot(x: jax.Array, ids: jax.Array) -> jax.Array:
    """`take_along_axis(x, ids[..., None], axis=1)` as a one-hot matmul.

    XLA lowers the straight gather of a (B, N, D) f32 tensor to a custom
    call PLUS a full layout copy of the result (traced at 0.65 ms/step at
    b256, scaling ~3x for 2x batch); the one-hot einsum rides the MXU
    instead. Exact: each output element is a single 1*x product (no
    accumulation ordering effects) — but ONLY at HIGHEST matmul precision:
    the TPU default truncates f32 operands to one bf16 pass, which would
    silently round the gathered values.
    """
    n = x.shape[1]
    onehot = jax.nn.one_hot(ids, n, dtype=x.dtype)          # (B, K, N)
    return jnp.einsum("bkn,bnd->bkd", onehot, x,
                      preferred_element_type=x.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def gather_patches(x: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather tokens along axis 1: (B, N, D), (B, K) -> (B, K, D)."""
    return jnp.take_along_axis(x, ids[:, :, None], axis=1)


def scatter_with_mask_tokens(x_visible: jax.Array, mask_token: jax.Array,
                             ids_restore: jax.Array) -> jax.Array:
    """Append mask tokens and un-shuffle to original patch order.

    Args:
      x_visible: (B, K, D) decoder-embedded visible tokens (no CLS).
      mask_token: (1, 1, D) learned mask token.
      ids_restore: (B, N) inverse permutation from :func:`random_masking`.

    Returns:
      (B, N, D) full-length sequence in original order.
    """
    b, k, d = x_visible.shape
    n = ids_restore.shape[1]
    mask_tokens = jnp.broadcast_to(mask_token, (b, n - k, d)).astype(x_visible.dtype)
    x_full = jnp.concatenate([x_visible, mask_tokens], axis=1)
    return jnp.take_along_axis(x_full, ids_restore[:, :, None], axis=1)
