"""LiT-style frozen-text feature cache: exactness + plumbing.

With text_trainable=False and frozen_text_eval_mode=True (the flagship
recipe), the text tower's output is a pure function of the caption, so it
is precomputed once per dataset and the per-step tower pass is skipped.
The cached path must match the inline-tower path to float tolerance (XLA
fuses the two graphs differently, so bitwise equality is not expected).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mae_clip_tpu.config import Config
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.models.vit import ViTConfig
from mae_clip_tpu.train.loop import (Trainer, make_train_step,
                                     precompute_text_features)
from mae_clip_tpu.train.optim import make_optimizer
from mae_clip_tpu.train.state import TrainState

TINY_TEXT = DistilBertConfig(vocab_size=64, dim=16, n_layers=1, n_heads=2,
                             hidden_dim=32, max_position_embeddings=32)
TINY_VIT = ViTConfig(image_size=16, patch_size=8, dim=16, depth=1, n_heads=2,
                     pos_embed="sincos")


def tiny_cfg(**kw) -> Config:
    base = dict(model_name="vit_s16", image_embedding=16, projection_dim=8,
                batch_size=8, size=16, compute_dtype="float32",
                text_trainable=False, frozen_text_eval_mode=True,
                pretrained=False, max_length=16)
    base.update(kw)
    return Config(**base)


def build(cfg, b=8, seq=12):
    model = CLIPModel(cfg, text_config=TINY_TEXT, vit_config=TINY_VIT)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.array(rng.normal(size=(b, 16, 16, 3)
                                      ).astype(np.float32)),
        "input_ids": jnp.array(rng.integers(0, 64, size=(b, seq)
                                            ).astype(np.int32)),
        "attention_mask": jnp.ones((b, seq), dtype=jnp.int32),
        "valid": jnp.ones((b,), dtype=bool),
    }
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))
    return model, variables, batch


def test_cached_step_matches_inline_tower():
    """Train step fed precomputed features == train step running the
    tower (numerically: XLA fuses the two graphs differently, so
    equality is to float tolerance, not bitwise)."""
    cfg = tiny_cfg()
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])

    feats = model.apply(variables, batch["input_ids"],
                        batch["attention_mask"], method=model.encode_text)
    cached_batch = {"image": batch["image"],
                    "text_features": jnp.asarray(feats),
                    "valid": batch["valid"]}

    def one_step(b):
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables["params"]), tx,
            jax.random.PRNGKey(2))
        step = make_train_step(model, tx, cfg)
        state, m = step(state, b)
        return float(m["loss"]), state

    l_ids, _ = one_step(batch)
    l_cached, _ = one_step(cached_batch)
    np.testing.assert_allclose(l_ids, l_cached, rtol=1e-6)

    # The embeddings the loss consumes are equal to float tolerance.
    # (Updated PARAMS are not compared: for near-zero gradients Adam's
    # first update is ±lr regardless of magnitude, so a 1e-9 numerical
    # difference can flip an update's sign — inherent to Adam, not to the
    # cache.)
    out_ids = model.apply(variables, batch,
                          mask_rng=jax.random.PRNGKey(3))
    out_cached = model.apply(variables, cached_batch,
                             mask_rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out_ids["text_embeddings"]),
                               np.asarray(out_cached["text_embeddings"]),
                               atol=1e-6)
    np.testing.assert_allclose(float(out_ids["loss"]),
                               float(out_cached["loss"]), rtol=1e-6)


def test_cached_step_requires_eval_mode_semantics():
    """With the reference-faithful frozen_text_eval_mode=False (train-mode
    dropout inside the frozen tower), caching is rejected."""
    cfg = tiny_cfg(frozen_text_eval_mode=False, cache_text_features=True)
    with pytest.raises(ValueError, match="cache_text_features"):
        cfg.validate()
    model, variables, _ = build(tiny_cfg(frozen_text_eval_mode=False))

    class DS:  # minimal dataset stub
        input_ids = np.zeros((4, 8), np.int32)
        attention_mask = np.ones((4, 8), np.int32)

        def __len__(self):
            return 4

    with pytest.raises(ValueError, match="frozen text tower"):
        precompute_text_features(model, variables, DS())


def test_precompute_matches_direct_encode_with_ragged_tail():
    cfg = tiny_cfg()
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(1)
    n, seq = 11, 12   # not divisible by batch_size=4

    class DS:
        input_ids = rng.integers(0, 64, size=(n, seq)).astype(np.int32)
        attention_mask = np.ones((n, seq), np.int32)

        def __len__(self):
            return n

    feats = precompute_text_features(model, variables, DS(), batch_size=4)
    direct = np.asarray(model.apply(
        variables, jnp.asarray(DS.input_ids), jnp.asarray(DS.attention_mask),
        method=model.encode_text))
    assert feats.shape == direct.shape
    np.testing.assert_allclose(feats, direct, atol=1e-6)


def test_loader_with_text_features(tmp_path):
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer(
        {w: i for i, w in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "b", "c"])})
    import cv2
    rng = np.random.default_rng(2)
    files = []
    for i in range(5):
        f = tmp_path / f"{i}.png"
        cv2.imwrite(str(f), rng.integers(0, 255, size=(8, 8, 3)
                                         ).astype(np.uint8))
        files.append(str(f))
    ds = CaptionDataset(files, ["a b c"] * 5, tok, size=8)
    tf = rng.normal(size=(5, 16)).astype(np.float32)

    batches = list(make_loader(ds, 2, text_features=tf, num_threads=1))
    assert len(batches) == 3
    for b in batches:
        assert "text_features" in b and "input_ids" not in b
        assert b["text_features"].shape == (2, 16)
    np.testing.assert_array_equal(batches[0]["text_features"], tf[:2])
    assert np.all(batches[-1]["text_features"][1] == 0)   # pad row
    assert batches[-1]["valid"].tolist() == [True, False]


def test_trainer_fit_cached_equals_uncached():
    cfg = tiny_cfg(epochs=1)
    model, variables, batch = build(cfg)
    tf = np.asarray(model.apply(variables, batch["input_ids"],
                                batch["attention_mask"],
                                method=model.encode_text), np.float32)

    def fit(cached):
        tx = make_optimizer(cfg, variables["params"])
        trainer = Trainer(cfg, model,
                          jax.tree_util.tree_map(jnp.copy,
                                                 variables["params"]), tx=tx)
        if cached:
            b = {"image": batch["image"],
                 "text_features": jnp.asarray(tf), "valid": batch["valid"]}
        else:
            b = batch
        loader = lambda *_: iter([
            {k: np.asarray(v) for k, v in b.items()}])
        return trainer.fit(loader, loader, epochs=1)

    h_ids = fit(False)
    h_cached = fit(True)
    np.testing.assert_allclose(h_cached["train_loss"], h_ids["train_loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(h_cached["valid_loss"], h_ids["valid_loss"],
                               rtol=1e-6)


def test_cached_mesh_step_matches_single_device():
    """text_features batches shard over the data axis like any other leaf;
    the global-contrastive mesh step matches the single-device step."""
    from mae_clip_tpu.parallel.mesh import create_mesh

    cfg = tiny_cfg(global_contrastive=True)
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    tf = model.apply(variables, batch["input_ids"],
                     batch["attention_mask"], method=model.encode_text)
    cached = {"image": batch["image"], "text_features": jnp.asarray(tf),
              "valid": batch["valid"]}

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state1 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    _, m1 = make_train_step(model, tx, cfg)(state1, cached)

    mesh = create_mesh(8, 1)
    state2 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    _, m2 = make_train_step(model, tx, cfg, mesh=mesh)(state2, cached)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               atol=1e-5)
