"""Image decode + preprocessing.

The reference's per-item host path is cv2.imread -> BGR2RGB -> albumentations
Resize(224,224, bilinear) -> Normalize(ImageNet mean/std, /255) -> CHW float
(reference: dataset.py:30-33,44-58). Two equivalent paths are provided:

* ``host_preprocess``: exact reference math on host (cv2 bilinear resize),
  for parity and for datasets of heterogeneous sizes; emits NHWC (the
  TPU-native layout — the reference's CHW is a torch convention).
* ``device_preprocess``: jittable resize+normalize on device
  (``jax.image.resize`` bilinear), so raw uint8 frames can be shipped to the
  TPU and the arithmetic rides the VPU instead of host CPU — the
  fused host-to-device pipeline of BASELINE.json's north star.

Train and valid transforms are IDENTICAL (the reference applies no
augmentation at all, dataset.py:44-58).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def decode_image(path: str) -> np.ndarray:
    """Read an image file to RGB uint8 HWC (cv2 with PIL fallback)."""
    try:
        import cv2
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Decode an in-memory encoded image to RGB uint8 HWC (cv2 path,
    identical pixels to :func:`decode_image` on the same bytes)."""
    try:
        import cv2
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("undecodable image bytes")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        import io as _io

        from PIL import Image
        return np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))


def host_preprocess(image: np.ndarray, size: int = 224) -> np.ndarray:
    """Reference-exact: bilinear resize to (size,size), ImageNet normalize.

    Input: RGB uint8/float HWC. Output: float32 NHWC-compatible (H, W, C).
    """
    try:
        import cv2
        resized = cv2.resize(image, (size, size),
                             interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image
        resized = np.asarray(
            Image.fromarray(image.astype(np.uint8)).resize(
                (size, size), Image.BILINEAR))
    out = resized.astype(np.float32) / 255.0
    return (out - IMAGENET_MEAN) / IMAGENET_STD


def normalize_uint8(images, compute_dtype=None):
    """Jit-friendly ImageNet normalization of uint8 input; handles NHWC
    (B,H,W,C) and pre-patchified (B,N,P*P*C) layouts (channel is the minor
    index of each patch vector). No-op for non-uint8 input."""
    import jax.numpy as jnp
    if images.dtype != jnp.uint8:
        return images
    x = images.astype(jnp.float32) / 255.0
    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)
    if x.ndim == 3:
        reps = x.shape[-1] // 3
        mean, std = jnp.tile(mean, reps), jnp.tile(std, reps)
    out = (x - mean) / std
    if compute_dtype is not None:
        out = out.astype(compute_dtype)
    return out


def random_resized_crop_flip(image: np.ndarray, size: int,
                             rng: np.random.Generator,
                             scale=(0.2, 1.0), ratio=(3 / 4, 4 / 3),
                             hflip: float = 0.5) -> np.ndarray:
    """torchvision-style RandomResizedCrop + horizontal flip on a decoded
    HWC image (any dtype), returning (size, size, C) of the same dtype.

    The MAE pretraining augmentation (arXiv:2111.06377 §A.1 uses
    RandomResizedCrop scale (0.2, 1.0) + flip). The reference trains CLIP
    with NO augmentation at all (train == valid transforms, reference
    dataset.py:44-58), so this is used only by the image-only pretraining
    loader — never by the parity CLIP path.

    Sampling mirrors torchvision.transforms.RandomResizedCrop: 10 tries of
    (area, log-uniform ratio), then center-crop fallback.
    """
    import cv2

    h, w = image.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        r = float(np.exp(log_r))
        cw = int(round(np.sqrt(target_area * r)))
        ch = int(round(np.sqrt(target_area / r)))
        if 0 < cw <= w and 0 < ch <= h:
            i = int(rng.integers(0, h - ch + 1))
            j = int(rng.integers(0, w - cw + 1))
            break
    else:
        # Fallback: largest center crop within the ratio bounds.
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw, ch = w, min(h, int(round(w / ratio[0])))
        elif in_ratio > ratio[1]:
            ch, cw = h, min(w, int(round(h * ratio[1])))
        else:
            cw, ch = w, h
        i, j = (h - ch) // 2, (w - cw) // 2
    crop = image[i:i + ch, j:j + cw]
    out = cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
    if hflip and rng.uniform() < hflip:
        out = out[:, ::-1]
    return np.ascontiguousarray(out)


def patchify_host(image: np.ndarray, patch_size: int) -> np.ndarray:
    """Host-side patchify: (H, W, C) -> (N, P*P*C), row-major patch order
    (same layout as models.vit.patchify). Shipping patches instead of NHWC
    keeps minor-dim-3 reshapes off the TPU (see models.vit.PatchEmbed)."""
    h, w, c = image.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = image.reshape(gh, p, gw, p, c).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(x.reshape(gh * gw, p * p * c))


@functools.partial(__import__("jax").jit, static_argnums=(1,))
def device_preprocess(images, size: int = 224):
    """Jittable batch resize+normalize: uint8 (B,H,W,C) -> float32 (B,s,s,C).

    Runs on-device so only compact uint8 crosses the host->HBM boundary.
    """
    import jax
    import jax.numpy as jnp
    x = images.astype(jnp.float32)
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bilinear")
    x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std
