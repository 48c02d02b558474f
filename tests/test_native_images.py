"""Native C++ image pipeline (native/imagepipe.cpp) vs the Python path.

The native path fuses JPEG decode -> bilinear resize (cv2 half-pixel-center
convention) -> patchify (images.py:patchify_host layout). cv2 resizes u8
with fixed-point arithmetic while the kernel uses float, so per-pixel
agreement is pinned to +-1/255; layout and decode are pinned exactly.
"""

import numpy as np
import pytest

from mae_clip_tpu.data import native_images
from mae_clip_tpu.data.images import patchify_host

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native_images.native_available(),
    reason="native/libimagepipe.so not built (make -C native)")


def _checker_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth-ish content so JPEG round-trip error stays small.
    y, x = np.mgrid[0:h, 0:w]
    base = (np.sin(x / 17.0) * 60 + np.cos(y / 23.0) * 60 + 128)
    img = np.stack([base, base * 0.7 + 40, 255 - base], axis=-1)
    img += rng.normal(0, 4, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_rgb_to_patches_matches_cv2_resize_plus_patchify():
    img = _checker_image(300, 401)
    got = native_images.rgb_to_patches(img, size=224, patch=16)
    resized = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
    want = patchify_host(resized, 16)
    assert got.shape == want.shape == (196, 768)
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1, f"max diff {diff.max()} (u8 rounding tolerance 1)"


def test_rgb_to_patches_identity_size_is_exact():
    """No resample when source already equals the target: exact patchify."""
    img = _checker_image(224, 224, seed=1)
    got = native_images.rgb_to_patches(img, size=224, patch=16)
    want = patchify_host(img, 16)
    np.testing.assert_array_equal(got, want)


def test_jpeg_to_patches_roundtrip(tmp_path):
    img = _checker_image(448, 448, seed=2)
    ok, buf = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    data = buf.tobytes()
    got = native_images.jpeg_to_patches(data, size=224, patch=16)
    assert got is not None and got.shape == (196, 768)
    # Python oracle: cv2 decode (same libjpeg family) -> resize -> patchify.
    dec = cv2.cvtColor(cv2.imdecode(np.frombuffer(data, np.uint8),
                                    cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    want = patchify_host(
        cv2.resize(dec, (224, 224), interpolation=cv2.INTER_LINEAR), 16)
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    # DCT-scaled decode (448 -> 224 at 1/2 scale inside libjpeg) resamples
    # slightly differently from decode-then-resize; pin a tight budget.
    assert np.mean(diff) < 3.0 and np.percentile(diff, 99) <= 12, (
        diff.mean(), np.percentile(diff, 99))


def test_jpeg_to_patches_rejects_garbage():
    assert native_images.jpeg_to_patches(b"not a jpeg", 224, 16) is None


def test_batch_files_threaded_with_failures(tmp_path):
    paths = []
    imgs = []
    for i in range(5):
        img = _checker_image(260 + 7 * i, 300 + 11 * i, seed=i)
        p = tmp_path / f"im{i}.jpg"
        cv2.imwrite(str(p), cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(str(p))
        imgs.append(img)
    paths.insert(2, str(tmp_path / "missing.jpg"))  # provoke one failure

    out, failed = native_images.batch_files_to_patches(paths, 224, 16,
                                                       n_threads=3)
    assert out.shape == (6, 196, 768) and failed.tolist() == [
        False, False, True, False, False, False]
    assert not out[2].any()  # failed row zeroed
    # Each successful row equals the single-image native path on the
    # decoded file (same code path, threaded).
    for row, p in ((0, paths[0]), (4, paths[4])):
        with open(p, "rb") as f:
            single = native_images.jpeg_to_patches(f.read(), 224, 16)
        np.testing.assert_array_equal(out[row], single)


def test_caption_dataset_native_path(tmp_path):
    """CaptionDataset(native='always') produces patch batches end-to-end."""
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab

    for i in range(3):
        img = _checker_image(250, 250, seed=10 + i)
        cv2.imwrite(str(tmp_path / f"x{i}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    tok = WordPieceTokenizer(build_vocab(["a cat dog bird"], vocab_size=32,
                                         min_frequency=1))
    ds = CaptionDataset([f"x{i}.jpg" for i in range(3)],
                        ["a cat", "a dog", "a bird"], tok,
                        image_path=str(tmp_path), size=32, max_length=8,
                        raw_uint8=True, patchify_size=16, native="always")
    batches = list(make_loader(ds, batch_size=2))
    assert batches[0]["image"].shape == (2, 4, 768)
    assert batches[0]["image"].dtype == np.uint8
    assert batches[1]["valid"].tolist() == [True, False]
