"""Config system: file round-trip, dotted overrides, recipe presets,
and the faithful scheduler quirk at the Trainer level."""

import json

import numpy as np
import pytest

from mae_clip_tpu.config import (Config, MAEConfig, coco_full_config,
                                 flagship_tpu_config, large_batch_mesh_config,
                                 notebook_config, reference_py_config)


def test_reference_defaults_match_reference_values():
    """Field values mirror reference config.py:3-36."""
    cfg = reference_py_config()
    assert cfg.batch_size == 8
    assert cfg.lr == 1e-3 and cfg.weight_decay == 1e-3
    assert cfg.patience == 2 and cfg.factor == 0.5 and cfg.epochs == 10
    assert cfg.model_name == "resnet50" and cfg.image_embedding == 2048
    assert cfg.text_embedding == 768 and cfg.max_length == 200
    assert cfg.temperature == 1.0 and cfg.size == 224
    assert cfg.projection_dim == 256 and cfg.dropout == 0.1
    assert cfg.text_trainable is False   # modules.py:35


def test_file_roundtrip(tmp_path):
    cfg = flagship_tpu_config(batch_size=64)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg.to_dict()))
    cfg2 = Config.from_file(str(p))
    assert cfg2 == cfg


def test_dotted_overrides():
    cfg = Config().with_overrides(
        ["lr=0.01", "mae.enabled=true", "mae.mask_ratio=0.5",
         "model_name=vit_s16", "mesh.model=2"])
    assert cfg.lr == 0.01
    assert cfg.mae.enabled and cfg.mae.mask_ratio == 0.5
    assert cfg.mesh.model == 2
    with pytest.raises(ValueError):
        Config().with_overrides(["not_a_key=1"])
    with pytest.raises(ValueError):
        Config.from_dict({"bogus": 1})


def test_presets_validate():
    from mae_clip_tpu.config import flagship_siglip_config, mae_pretrain_config
    for preset in (reference_py_config, notebook_config, flagship_tpu_config,
                   flagship_siglip_config, mae_pretrain_config,
                   coco_full_config, large_batch_mesh_config):
        preset().validate()
    assert large_batch_mesh_config().batch_size == 32768
    assert large_batch_mesh_config().loss_chunk_size > 0
    assert large_batch_mesh_config().accum_steps == 8
    # LAMB adopted round 5: measured FREE at the 32k step cadence
    # (3,616.7 vs adamw 3,617 pairs/s — BASELINE.md round-5 section).
    assert large_batch_mesh_config().optimizer == "lamb"
    # The recommended from-scratch recipe (round-3 quality campaign).
    s = flagship_siglip_config()
    assert s.contrastive_loss == "siglip" and s.lr == 2e-4
    assert s.mae.enabled and s.model_name == "vit_s16"


def test_scheduler_quirk_py_vs_notebook():
    """The reference's .py recipe NEVER steps its plateau scheduler
    (main.py:60-61,107); the notebook recipe steps it on valid loss."""
    import jax
    from mae_clip_tpu.train.loop import Trainer
    from mae_clip_tpu.train.optim import get_lr_scale
    from tests.test_train import build, tiny_batch, tiny_cfg

    def run(recipe):
        # lr~0 so the valid loss is flat across epochs (changes below the
        # scheduler's 1e-4 relative threshold) => a genuine plateau.
        cfg = tiny_cfg(recipe=recipe, epochs=5, patience=0, factor=0.5,
                       scheduler_step="epoch", lr=1e-12, head_lr=1e-12,
                       image_encoder_lr=1e-12, text_encoder_lr=1e-12,
                       text_trainable=(recipe == "notebook"))
        model, variables, _ = build(cfg)
        trainer = Trainer(cfg, model, variables["params"])
        def loaders(epoch):
            rng = np.random.default_rng(7)
            return iter([{k: np.asarray(v)
                          for k, v in tiny_batch(rng).items()}])

        trainer.fit(loaders, loaders)
        return get_lr_scale(trainer.state.opt_state)

    assert run("py") == 1.0              # scheduler never fires (faithful)
    assert run("notebook") < 1.0         # plateau reduces LR


def test_tpu_first_knobs():
    """gelu_impl / image_heads / text_heads / frozen_text_eval_mode:
    flagship opts in; defaults stay parity-exact (None/erf/canonical)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mae_clip_tpu.models.clip import CLIPModel
    from tests.test_train import TINY_TEXT, TINY_VIT, build, tiny_batch, tiny_cfg

    cfg = flagship_tpu_config()
    assert cfg.gelu_impl == "tanh"
    assert cfg.image_heads == 3 and cfg.text_heads == 6
    assert cfg.frozen_text_eval_mode is True
    # Defaults keep weight-interop geometry / exact erf GELU.
    base = Config()
    assert base.gelu_impl is None
    assert base.image_heads is None and base.text_heads is None
    from mae_clip_tpu.config import reference_py_config
    assert reference_py_config().frozen_text_eval_mode is False

    # gelu_impl actually changes the math (tanh vs erf differ in bf16/fp32).
    rng = np.random.default_rng(3)
    batch = tiny_batch(rng)
    outs = {}
    for impl in (None, "tanh"):
        cfg_t = tiny_cfg(gelu_impl=impl)
        model = CLIPModel(cfg_t, text_config=TINY_TEXT, vit_config=TINY_VIT)
        variables = model.init(jax.random.PRNGKey(0), batch,
                               mask_rng=jax.random.PRNGKey(1))
        out = model.apply(variables, batch, mask_rng=jax.random.PRNGKey(1))
        outs[impl] = float(out["loss"])
    assert outs[None] != outs["tanh"]

    # Head overrides skip towers whose dim they do not divide (tiny towers),
    # rather than erroring out.
    cfg_h = tiny_cfg(image_heads=3, text_heads=6)
    model, variables, batch = build(cfg_h)
    out = model.apply(variables, batch, mask_rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(out["loss"]))


def test_frozen_text_eval_mode_semantics():
    """With the knob on, a frozen text tower produces identical text
    embeddings in train and eval mode (no dropout noise); the faithful
    reference mode (knob off) requires dropout rng at train time."""
    import jax
    import numpy as np
    from mae_clip_tpu.models.clip import CLIPModel
    from tests.test_train import TINY_TEXT, TINY_VIT, tiny_batch, tiny_cfg

    rng = np.random.default_rng(5)
    batch = tiny_batch(rng)
    cfg = tiny_cfg(text_trainable=False, frozen_text_eval_mode=True,
                   dropout=0.5)
    model = CLIPModel(cfg, text_config=TINY_TEXT, vit_config=TINY_VIT)
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))

    # Text FEATURES (pre-projection): with the knob on they match between
    # train and eval exactly (the frozen tower runs deterministic).
    def text_feats(train):
        rngs = {"dropout": jax.random.PRNGKey(7)} if train else {}
        feats = model.apply(variables, batch["input_ids"],
                            batch["attention_mask"], train=train,
                            method=model.encode_text, rngs=rngs)
        return np.asarray(feats, dtype=np.float64)

    np.testing.assert_array_equal(text_feats(True), text_feats(False))


def test_validate_new_training_knobs():
    import pytest

    from mae_clip_tpu.config import Config

    with pytest.raises(ValueError, match="grad_clip_norm"):
        Config(grad_clip_norm=-1.0).validate()
    with pytest.raises(ValueError, match="ema_decay"):
        Config(ema_decay=1.0).validate()
    with pytest.raises(ValueError, match="checkpoint_every"):
        Config(checkpoint_every=-1).validate()
    Config(grad_clip_norm=1.0, ema_decay=0.999,
           checkpoint_every=0).validate()
