"""Linear-probe evaluation (MAE-paper protocol, arXiv:2111.06377 §4.3)."""

import jax.numpy as jnp
import numpy as np

from mae_clip_tpu.eval.linear_probe import (fit_linear_probe,
                                            linear_probe_dir_eval,
                                            probe_accuracy)


def test_fit_linear_probe_separable():
    """Well-separated Gaussian clusters -> near-perfect held-out top-1."""
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3, 8)) * 5.0
    labels = rng.integers(0, 3, size=300)
    feats = centers[labels] + rng.normal(size=(300, 8))
    w, b, stats = fit_linear_probe(jnp.asarray(feats[:200], jnp.float32),
                                   jnp.asarray(labels[:200]), num_classes=3,
                                   steps=300)
    out = probe_accuracy(w, b, stats, jnp.asarray(feats[200:], jnp.float32),
                         labels[200:], ks=(1, 5))
    assert out["top1_accuracy"] > 0.95
    assert out["top5_accuracy"] == 1.0  # k clamps to 3 classes


def test_probe_is_deterministic():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(50, 4)).astype(np.float32)
    labels = rng.integers(0, 2, size=50)
    w1, b1, _ = fit_linear_probe(jnp.asarray(feats), jnp.asarray(labels), 2,
                                 steps=50)
    w2, b2, _ = fit_linear_probe(jnp.asarray(feats), jnp.asarray(labels), 2,
                                 steps=50)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_linear_probe_dir_eval(tmp_path):
    """Class-per-subdirectory tree where class == dominant color: a probe
    on mean-pixel features must solve it."""
    import cv2

    rng = np.random.default_rng(2)
    colors = {"red": (0, 0, 255), "green": (0, 255, 0), "blue": (255, 0, 0)}
    for cname, bgr in colors.items():
        d = tmp_path / cname
        d.mkdir()
        for i in range(8):
            img = np.zeros((16, 16, 3), np.uint8)
            img[:] = bgr
            noise = rng.integers(0, 60, size=img.shape)
            img = np.clip(img.astype(int) + noise - 30, 0, 255).astype(
                np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img)

    def encode_fn(variables, images):
        return jnp.mean(images, axis=(1, 2))  # (B, 3) mean-pixel features

    out = linear_probe_dir_eval(None, {}, str(tmp_path), size=16,
                                batch_size=5, val_fraction=0.25, steps=300,
                                encode_fn=encode_fn)
    assert out["num_classes"] == 3.0
    assert out["num_train"] + out["num_val"] == 24.0
    assert out["probe_top1_accuracy"] == 1.0
    assert out["probe_train_top1"] == 1.0
