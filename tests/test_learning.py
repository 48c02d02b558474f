"""End-to-end learning signal: the full system (tokenizer -> loader ->
jitted train step -> retrieval eval) learns a real association.

Images are color patches; captions name the color. After a short training
run, text->image retrieval must rank same-color images first — this
catches wiring bugs that loss-goes-down tests miss (e.g. mismatched
image/caption pairing, broken projections, sign errors in the loss).

Empirical note (measured here): with the reference's exact soft-target
loss — targets NOT detached, embeddings unnormalized (reference
CLIP.py:34-43) — lr >= 5e-4 collapses this tiny from-scratch model to
uniform embeddings (loss pinned at ln(batch)); lr 2e-4 learns cleanly.
The reference avoids this by fine-tuning strong pretrained towers.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mae_clip_tpu.config import Config
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.models.vit import ViTConfig
from mae_clip_tpu.ops.retrieval import retrieval_topk
from mae_clip_tpu.train.loop import make_train_step
from mae_clip_tpu.train.optim import make_optimizer
from mae_clip_tpu.train.state import TrainState

COLORS = {
    "red": (1.0, 0.1, 0.1),
    "green": (0.1, 1.0, 0.1),
    "blue": (0.1, 0.1, 1.0),
    "yellow": (1.0, 1.0, 0.1),
}


def _image(rng, color):
    img = np.zeros((16, 16, 3), np.float32)
    img[:] = COLORS[color]
    return (img + rng.normal(scale=0.05, size=img.shape)).astype(np.float32)


def test_clip_learns_color_retrieval():
    cfg = Config(model_name="vit_s16", image_embedding=32, projection_dim=8,
                 batch_size=16, size=16, compute_dtype="float32",
                 text_trainable=True, frozen_text_eval_mode=False,
                 pretrained=False, max_length=8, lr=2e-4, dropout=0.0,
                 temperature=1.0)
    tok = WordPieceTokenizer(build_vocab(
        [f"a {c} patch" for c in COLORS], vocab_size=32, min_frequency=1))
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=32,
                                     n_layers=1, n_heads=2, hidden_dim=64,
                                     max_position_embeddings=16),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=32, depth=1,
                             n_heads=2, pos_embed="sincos"))

    rng = np.random.default_rng(0)
    names = list(COLORS)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        colors = r.choice(names, size=cfg.batch_size)
        enc = tok.encode_batch([f"a {c} patch" for c in colors],
                               max_length=8, fixed_length=8)
        return {
            "image": jnp.asarray(np.stack([_image(r, c) for c in colors])),
            "input_ids": jnp.asarray(enc["input_ids"], jnp.int32),
            "attention_mask": jnp.asarray(enc["attention_mask"], jnp.int32),
            "valid": jnp.ones((cfg.batch_size,), bool),
        }

    variables = model.init(jax.random.PRNGKey(0), make_batch(0))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, cfg)

    first = last = None
    for i in range(300):
        state, metrics = step(state, make_batch(100 + i))
        if i == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert np.isfinite(last) and last < first

    # Held-out gallery: 3 fresh images per color; query each color name.
    variables = {"params": state.params}
    gallery_colors = [c for c in names for _ in range(3)]
    r = np.random.default_rng(999)
    imgs = jnp.asarray(np.stack([_image(r, c) for c in gallery_colors]))
    feats = model.apply(variables, imgs, method=model.encode_image)
    gallery = model.apply(variables, feats, method=model.project_image)

    enc = tok.encode_batch([f"a {c} patch" for c in names],
                           max_length=8, fixed_length=8)
    tfeats = model.apply(variables, jnp.asarray(enc["input_ids"], jnp.int32),
                         jnp.asarray(enc["attention_mask"], jnp.int32),
                         method=model.encode_text)
    temb = model.apply(variables, tfeats, method=model.project_text)

    _, idx = retrieval_topk(temb, gallery, k=3)
    idx = np.asarray(idx)
    hits = sum(gallery_colors[idx[q][0]] == names[q] for q in range(len(names)))
    # Top-1 gallery image matches the queried color for every color.
    assert hits == len(names), \
        f"{hits}/{len(names)} colors retrieved correctly: " \
        f"{[[gallery_colors[j] for j in row] for row in idx]}"
