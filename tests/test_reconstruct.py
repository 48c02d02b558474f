"""MAE reconstruction visualization (paper Fig. 2 protocol)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mae_clip_tpu.eval.reconstruct import (mae_reconstructions,
                                           save_reconstruction_grid)
from mae_clip_tpu.models.mae import MAEDecoderConfig, MAEViT
from mae_clip_tpu.models.vit import ViTConfig, patchify

TINY = ViTConfig(image_size=32, patch_size=8, dim=32, depth=1, n_heads=4,
                 pos_embed="sincos")
DEC = MAEDecoderConfig(dim=16, depth=1, n_heads=4)


@pytest.mark.parametrize("style", ["full", "cross"])
def test_reconstruction_composite(style):
    model = MAEViT(TINY, decoder=DEC, mask_ratio=0.75, decoder_style=style)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    out = mae_reconstructions(model, variables, x, jax.random.PRNGKey(1))
    for k in ("original", "masked", "reconstructed"):
        assert out[k].shape == (2, 32, 32, 3)
        assert out[k].min() >= 0.0 and out[k].max() <= 1.0

    # Visible patches pass through untouched: compare patch-wise where
    # mask == 0 (recompute the model's own deterministic masking).
    from mae_clip_tpu.ops.masking import random_masking
    masking = random_masking(jax.random.PRNGKey(1), 2, 16, 0.75)
    po = patchify(jnp.asarray(out["original"]), 8)
    pr = patchify(jnp.asarray(out["reconstructed"]), 8)
    vis = np.asarray(masking.mask) == 0
    np.testing.assert_allclose(np.asarray(po)[vis], np.asarray(pr)[vis],
                               atol=1e-6)
    # Masked patches differ from the original (random-init decoder).
    assert not np.allclose(np.asarray(po)[~vis], np.asarray(pr)[~vis],
                           atol=1e-3)


def test_save_reconstruction_grid(tmp_path):
    model = MAEViT(TINY, decoder=DEC, mask_ratio=0.75)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    out = mae_reconstructions(model, variables, x, jax.random.PRNGKey(1))
    path = tmp_path / "grid.png"
    save_reconstruction_grid(out, str(path))
    assert path.stat().st_size > 0
