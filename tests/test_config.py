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
    for preset in (reference_py_config, notebook_config, flagship_tpu_config,
                   coco_full_config, large_batch_mesh_config):
        preset().validate()
    assert large_batch_mesh_config().batch_size == 32768
    assert large_batch_mesh_config().loss_chunk_size > 0


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
