"""On-device image augmentation: batched RandomResizedCrop + flip.

TPU-native answer to the MAE-pretraining input bottleneck. The host
augmentation path (`data.images.random_resized_crop_flip`) must re-decode
and re-crop every image every epoch on the host — measured ~19-26 img/s
on this container's single CPU core, i.e. two orders of magnitude below
the ~9k img/s device step. Moving the crop ON DEVICE factors the work:

  host   : decode each image ONCE at a fixed square ``source`` size
           (cacheable via ``cache_images``, stageable in HBM via
           ``device_data`` — both are geometry-independent now)
  device : per step, sample a fresh crop box per example and bilinearly
           resample it to ``out_size`` inside the jitted train step
           (grid-sample via two axis gathers + lerp — VPU/HBM work that
           overlaps the surrounding matmuls)

Sampling semantics mirror ``torchvision.transforms.RandomResizedCrop``
(the MAE paper's augmentation, arXiv:2111.06377 §A.1; reference repo
itself trains CLIP with no augmentation at all, dataset.py:44-58): 10
tries of (uniform area in ``scale`` x log-uniform aspect in ``ratio``),
first in-bounds try wins, else the center fallback. The 10 candidate
tuples are drawn at once and the first valid one selected — independent
draws make this distributionally identical to torchvision's sequential
try loop. The one deliberate divergence: crops are taken from the
fixed-size square re-decode, not the original-resolution frame (the
original never reaches the device), so extreme source aspect ratios are
pre-squashed; ``source_size`` > ``out_size`` keeps real down-sampling
diversity.

Bilinear resampling uses the cv2/torchvision half-pixel convention
(src = (dst + 0.5) * crop/out - 0.5, edge-clamped), so a full-frame
"crop" reproduces ``cv2.resize`` to ~1e-2 (uint8 ULP) — pinned in
tests/test_augment.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def sample_crop_boxes(key: jax.Array, batch: int, source: int,
                      scale: Tuple[float, float] = (0.2, 1.0),
                      ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                      tries: int = 10):
    """Sample (i, j, ch, cw) float crop boxes, one per example.

    Vectorized torchvision semantics: per example, ``tries`` candidate
    (area, log-aspect) draws; the first whose width/height fit the source
    wins; all-invalid falls back to the full (square) frame.
    Returns float32 arrays (i, j, ch, cw) each (batch,).
    """
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    area = source * source
    target = area * jax.random.uniform(
        k_area, (batch, tries), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k_ratio, (batch, tries),
        minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    r = jnp.exp(log_r)
    cw = jnp.round(jnp.sqrt(target * r))
    ch = jnp.round(jnp.sqrt(target / r))
    valid = (cw > 0) & (cw <= source) & (ch > 0) & (ch <= source)
    # First valid try (argmax returns first True); fallback full frame.
    first = jnp.argmax(valid, axis=1)
    any_valid = valid.any(axis=1)
    pick = lambda a: jnp.take_along_axis(a, first[:, None], axis=1)[:, 0]
    cw = jnp.where(any_valid, pick(cw), float(source))
    ch = jnp.where(any_valid, pick(ch), float(source))
    # Offsets: uniform integer in [0, source - c]; float draw floored.
    u_i = jax.random.uniform(k_i, (batch,))
    u_j = jax.random.uniform(k_j, (batch,))
    i = jnp.floor(u_i * (source - ch + 1)).clip(0, source - 1)
    j = jnp.floor(u_j * (source - cw + 1)).clip(0, source - 1)
    return (i.astype(jnp.float32), j.astype(jnp.float32),
            ch.astype(jnp.float32), cw.astype(jnp.float32))


def _axis_coords(offset: jax.Array, extent: jax.Array, out_size: int):
    """Per-example float source coordinates along one axis:
    src = off + (k + 0.5) * extent/out - 0.5 (cv2 INTER_LINEAR mapping)."""
    k = jnp.arange(out_size, dtype=jnp.float32)[None, :]      # (1, out)
    return (offset[:, None]
            + (k + 0.5) * (extent[:, None] / out_size) - 0.5)  # (B, out)


def _lerp_gather(x: jax.Array, coords: jax.Array, axis: int) -> jax.Array:
    """Bilinear 1-D resample of ``x`` along ``axis`` at per-example float
    ``coords`` (B, out): two clamped gathers + lerp."""
    n = x.shape[axis]
    c0 = jnp.floor(coords)
    w = (coords - c0).astype(x.dtype)
    # Clamp i0 and i1 INDEPENDENTLY from the unclipped floor: for a
    # negative coord (upsampled edge crop, e.g. -0.25 -> c0=-1, w=0.75)
    # both neighbours must clamp to row 0 so the lerp reproduces cv2's
    # edge replication; i1 = clip(i0 + 1) would blend row 1 in instead.
    i0 = jnp.clip(c0.astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(c0.astype(jnp.int32) + 1, 0, n - 1)
    shape = [coords.shape[0]] + [1] * (x.ndim - 1)
    shape[axis] = coords.shape[1]

    def take(idx):
        return jnp.take_along_axis(x, idx.reshape(shape), axis=axis)

    wshape = w.reshape(shape)
    return take(i0) * (1 - wshape) + take(i1) * wshape


@partial(jax.jit, static_argnames=("out_size", "scale", "ratio", "hflip",
                                   "tries"))
def random_resized_crop_flip_batch(images: jax.Array, key: jax.Array,
                                   out_size: int,
                                   scale: Tuple[float, float] = (0.2, 1.0),
                                   ratio: Tuple[float, float] = (3 / 4,
                                                                 4 / 3),
                                   hflip: float = 0.5,
                                   tries: int = 10) -> jax.Array:
    """(B, S, S, C) any-dtype batch -> (B, out, out, C) float32 crops.

    Per-example RandomResizedCrop + horizontal flip, fully on device and
    jit-traceable (static output shape; all randomness from ``key``).
    Output stays in the input's value range (uint8 in -> 0..255 floats);
    compose with ``data.images.normalize_uint8``-style normalization in
    the caller (the MAE train step fuses it).
    """
    b, s, s2, _ = images.shape
    assert s == s2, "device augmentation expects square sources"
    k_box, k_flip = jax.random.split(key)
    i, j, ch, cw = sample_crop_boxes(k_box, b, s, scale, ratio, tries)
    ys = _axis_coords(i, ch, out_size)                        # (B, out)
    xs = _axis_coords(j, cw, out_size)
    if hflip:
        flip = jax.random.uniform(k_flip, (b,)) < hflip
        xs = jnp.where(flip[:, None], xs[:, ::-1], xs)
    x = images.astype(jnp.float32)
    x = _lerp_gather(x, ys, axis=1)                           # rows
    x = _lerp_gather(x, xs, axis=2)                           # cols
    return x


@partial(jax.jit, static_argnames=("out_size",))
def resize_batch(images: jax.Array, out_size: int) -> jax.Array:
    """Deterministic full-frame bilinear resize (B, S, S, C) ->
    (B, out, out, C) float32 — the eval-path counterpart of the random
    crop (same half-pixel convention, so train and eval geometries
    match)."""
    b, s, _, _ = images.shape
    full = jnp.full((b,), float(s), jnp.float32)
    zero = jnp.zeros((b,), jnp.float32)
    ys = _axis_coords(zero, full, out_size)
    x = images.astype(jnp.float32)
    x = _lerp_gather(x, ys, axis=1)
    return _lerp_gather(x, ys, axis=2)
