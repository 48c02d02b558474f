"""On-device RandomResizedCrop+flip (ops/augment.py): cv2 parity for the
deterministic geometry, torchvision-style box sampling bounds, flip and
determinism semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from mae_clip_tpu.ops.augment import (random_resized_crop_flip_batch,
                                      resize_batch, sample_crop_boxes)


def _imgs(b=3, s=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(b, s, s, 3)).astype(np.uint8)


def test_full_frame_crop_matches_cv2_resize():
    """scale=ratio=1 forces the crop to the whole frame, reducing the op
    to a plain bilinear resize — must match cv2.INTER_LINEAR (the host
    pipeline's resizer) to uint8 ULP."""
    import cv2

    imgs = _imgs(b=2, s=24)
    out = np.asarray(random_resized_crop_flip_batch(
        jnp.asarray(imgs), jax.random.PRNGKey(0), 16,
        scale=(1.0, 1.0), ratio=(1.0, 1.0), hflip=0.0))
    for k in range(2):
        ref = cv2.resize(imgs[k].astype(np.float32), (16, 16),
                         interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(out[k], ref, atol=1.0)
        assert np.mean(np.abs(out[k] - ref)) < 0.05


def test_resize_batch_matches_cv2():
    import cv2

    imgs = _imgs(b=2, s=20)
    out = np.asarray(resize_batch(jnp.asarray(imgs), 14))
    for k in range(2):
        ref = cv2.resize(imgs[k].astype(np.float32), (14, 14),
                         interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(out[k], ref, atol=1.0)


def test_flip_mirrors_output():
    imgs = _imgs(b=2, s=24)
    base = np.asarray(random_resized_crop_flip_batch(
        jnp.asarray(imgs), jax.random.PRNGKey(3), 16,
        scale=(1.0, 1.0), ratio=(1.0, 1.0), hflip=0.0))
    flipped = np.asarray(random_resized_crop_flip_batch(
        jnp.asarray(imgs), jax.random.PRNGKey(3), 16,
        scale=(1.0, 1.0), ratio=(1.0, 1.0), hflip=1.0))
    np.testing.assert_allclose(flipped, base[:, :, ::-1], atol=1e-4)


def test_deterministic_in_key_and_varies_across_keys():
    imgs = jnp.asarray(_imgs(b=4, s=32))
    a = np.asarray(random_resized_crop_flip_batch(
        imgs, jax.random.PRNGKey(7), 16))
    b = np.asarray(random_resized_crop_flip_batch(
        imgs, jax.random.PRNGKey(7), 16))
    c = np.asarray(random_resized_crop_flip_batch(
        imgs, jax.random.PRNGKey(8), 16))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1.0          # different crops
    # Per-example boxes differ within one batch too.
    assert np.abs(a[0] - a[1]).max() > 1.0


def test_sampled_boxes_in_bounds_and_scale_range():
    s = 64
    i, j, ch, cw = jax.tree_util.tree_map(np.asarray, sample_crop_boxes(
        jax.random.PRNGKey(0), 512, s))
    assert (ch >= 1).all() and (cw >= 1).all()
    assert (ch <= s).all() and (cw <= s).all()
    assert (i >= 0).all() and (j >= 0).all()
    assert (i + ch <= s + 1e-6).all() and (j + cw <= s + 1e-6).all()
    frac = (ch * cw) / (s * s)
    # rounding can nudge slightly past the nominal (0.2, 1.0) area range
    assert frac.min() > 0.15 and frac.max() <= 1.0
    aspect = cw / ch
    assert aspect.min() > 0.7 and aspect.max() < 1.45


def test_values_stay_in_input_range():
    imgs = jnp.asarray(_imgs(b=4, s=32))
    out = np.asarray(random_resized_crop_flip_batch(
        imgs, jax.random.PRNGKey(1), 16))
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert out.dtype == np.float32


def test_upsample_matches_cv2_edge_clamp():
    """Upsampling places the first/last output rows at out-of-range source
    coordinates (e.g. -0.25 at 2x): BOTH lerp neighbours must clamp to the
    edge row (cv2 replication) — clipping i1 from the already-clipped i0
    would blend row 1 into row 0 (regression test)."""
    import cv2

    imgs = _imgs(b=2, s=8)
    out = np.asarray(resize_batch(jnp.asarray(imgs), 16))
    for k in range(2):
        ref = cv2.resize(imgs[k].astype(np.float32), (16, 16),
                         interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(out[k], ref, atol=1.0)
        assert np.mean(np.abs(out[k] - ref)) < 0.05
