"""End-to-end training: jitted step, mesh step, Trainer.fit, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mae_clip_tpu.config import Config, MAEConfig
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.models.vit import ViTConfig
from mae_clip_tpu.parallel.mesh import create_mesh
from mae_clip_tpu.train.loop import Trainer, make_eval_step, make_train_step
from mae_clip_tpu.train.optim import make_optimizer
from mae_clip_tpu.train.state import TrainState

TINY_TEXT = DistilBertConfig(vocab_size=64, dim=16, n_layers=1, n_heads=2,
                             hidden_dim=32, max_position_embeddings=32)
TINY_VIT = ViTConfig(image_size=16, patch_size=8, dim=16, depth=1, n_heads=2,
                     pos_embed="sincos")


def tiny_cfg(**kw) -> Config:
    base = dict(model_name="vit_s16", image_embedding=16, projection_dim=8,
                batch_size=8, size=16, compute_dtype="float32",
                text_trainable=False, pretrained=False, max_length=16)
    base.update(kw)
    return Config(**base)


def tiny_batch(rng, b=8, seq=12):
    return {
        "image": jnp.array(rng.normal(size=(b, 16, 16, 3)).astype(np.float32)),
        "input_ids": jnp.array(rng.integers(0, 64, size=(b, seq)).astype(np.int32)),
        "attention_mask": jnp.ones((b, seq), dtype=jnp.int32),
        "valid": jnp.ones((b,), dtype=bool),
    }


def build(cfg):
    model = CLIPModel(cfg, text_config=TINY_TEXT, vit_config=TINY_VIT)
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))
    return model, variables, batch


def test_train_step_loss_decreases_and_freezes_text():
    cfg = tiny_cfg()
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)

    # Copy to host BEFORE stepping: the train step donates the state (and
    # ``variables`` shares buffers with it).
    text_before = [np.asarray(x).copy() for x in
                   jax.tree_util.tree_leaves(state.params["text_encoder"])]
    proj_before = np.asarray(jax.tree_util.tree_leaves(
        state.params["image_projection"])[0]).copy()
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # Frozen text tower params unchanged (reference modules.py:35 semantics).
    text_after = jax.tree_util.tree_leaves(state.params["text_encoder"])
    for a, b in zip(text_before, text_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Image tower + heads DID move.
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(
            state.params["image_projection"])[0]), proj_before)


def test_train_step_with_mae_joint_loss():
    cfg = tiny_cfg(mae=MAEConfig(enabled=True, mask_ratio=0.5,
                                 decoder_dim=16, decoder_depth=1,
                                 decoder_heads=2))
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)
    state, metrics = step(state, batch)
    assert "mae_loss" in metrics
    assert np.isfinite(float(metrics["loss"]))
    assert np.isclose(float(metrics["loss"]),
                      float(metrics["clip_loss"]) + float(metrics["mae_loss"]),
                      rtol=1e-5)


def test_mesh_step_matches_single_device():
    cfg = tiny_cfg(global_contrastive=True)
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state1 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    step1 = make_train_step(model, tx, cfg)
    state1, m1 = step1(state1, batch)

    mesh = create_mesh(8, 1)
    state2 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    step2 = make_train_step(model, tx, cfg, mesh=mesh)
    state2, m2 = step2(state2, batch)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               atol=1e-5)

    # Full-model GRADIENTS agree between the local loss and the shard_map
    # global loss (comparing post-Adam params is noise-amplifying: Adam
    # normalizes near-zero grads to +-lr, so fp-noise flips sign).
    from mae_clip_tpu.ops.losses import clip_soft_ce_loss
    from mae_clip_tpu.train.loop import _clip_loss_fn

    def grads_with(loss_fn, params):
        def f(p):
            out = model.apply({"params": p}, batch,
                              compute_contrastive=False)
            return loss_fn(out["image_embeddings"], out["text_embeddings"],
                           batch["valid"])
        return jax.grad(f)(params)

    params = copy(variables["params"])
    g_local = grads_with(
        lambda i, t, v: clip_soft_ce_loss(i, t, cfg.temperature, v), params)
    with mesh:
        g_global = grads_with(_clip_loss_fn(cfg, mesh), params)
    for a, b in zip(jax.tree_util.tree_leaves(g_local),
                    jax.tree_util.tree_leaves(g_global)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   rtol=1e-5)


def test_mesh_step_with_model_axis():
    """DP x TP mesh (4x2) compiles and runs with TP-sharded kernels."""
    cfg = tiny_cfg(global_contrastive=True)
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    mesh = create_mesh(4, 2)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg, mesh=mesh)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_deterministic():
    cfg = tiny_cfg()
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    ev = make_eval_step(model, cfg)
    a = float(ev(state, batch)["loss"])
    b = float(ev(state, batch)["loss"])
    assert a == b
    assert np.isfinite(a)


def _loaders(rng, n_batches=3, b=8):
    batches = [
        {k: np.asarray(v) for k, v in tiny_batch(rng, b=b).items()}
        for _ in range(n_batches)]
    return lambda: iter(batches)


def test_trainer_fit_and_checkpoint(tmp_path):
    from mae_clip_tpu.train.checkpoint import CheckpointManager, abstract_like
    from mae_clip_tpu.train.metrics import MetricWriter

    cfg = tiny_cfg(epochs=2, logdir=str(tmp_path / "logs"),
                   checkpoints=str(tmp_path / "ckpt"))
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(0)
    mngr = CheckpointManager(cfg.checkpoints)
    writer = MetricWriter(cfg.logdir)
    trainer = Trainer(cfg, model, variables["params"],
                      checkpoint_manager=mngr, writer=writer)
    history = trainer.fit(_loaders(rng), _loaders(rng, n_batches=2))
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["valid_loss"])
    mngr.wait()

    # Metrics JSONL written.
    import json, os
    lines = [json.loads(l) for l in
             open(os.path.join(cfg.logdir, "metrics.jsonl"))]
    assert len(lines) == 2
    assert "loss/train" in lines[0] and "lr" in lines[0]

    # Restore roundtrip: params identical to in-memory state.
    restored, meta = mngr.restore(abstract_like(trainer.state))
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["best_loss"] == trainer.best_loss
    assert int(restored.step) == int(trainer.state.step)
    mngr.close()
    writer.close()

    # CLI-style restore without abstract state: load_variables picks the
    # best-valid-loss step out of the Trainer run directory.
    from mae_clip_tpu.train.checkpoint import load_variables
    best = CheckpointManager(cfg.checkpoints)._mngr.best_step()
    loaded = load_variables(cfg.checkpoints, cfg)
    assert set(loaded) == {"params"}   # ViT tower: no batch_stats
    ref_mngr = CheckpointManager(cfg.checkpoints)
    ref_state, _ = ref_mngr.restore(abstract_like(trainer.state), step=best)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(loaded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ref_mngr.close()

    # StandardCheckpointer form (what `cli import-pth` writes).
    import orbax.checkpoint as ocp
    bare = str(tmp_path / "bare")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(bare, {"params": trainer.state.params})
    ckptr.wait_until_finished()
    loaded2 = load_variables(bare, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(loaded2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_ragged_batch_metrics():
    """Count-weighted epoch loss over a ragged tail (reference AvgMeter)."""
    cfg = tiny_cfg()
    model, variables, _ = build(cfg)
    trainer = Trainer(cfg, model, variables["params"])
    rng = np.random.default_rng(1)
    full = {k: np.asarray(v) for k, v in tiny_batch(rng).items()}
    ragged = {k: np.array(v) for k, v in tiny_batch(rng).items()}
    ragged["valid"][5:] = False
    meter = trainer.valid_epoch(iter([full, ragged]))
    assert meter.count == 8 + 5
    assert np.isfinite(meter.avg)


def test_trainer_resume_continues_identically(tmp_path):
    """Resume-from-checkpoint reproduces uninterrupted training exactly:
    full TrainState (incl. optimizer + rng) roundtrips through Orbax."""
    from mae_clip_tpu.train.checkpoint import CheckpointManager

    def batches_for(epoch):
        rng = np.random.default_rng(100 + epoch)
        return iter([{k: np.asarray(v) for k, v in tiny_batch(rng).items()}
                     for _ in range(2)])

    def run(ckpt_dir, epochs, resume=False):
        cfg = tiny_cfg(epochs=epochs, checkpoints=str(ckpt_dir))
        model, variables, _ = build(cfg)
        mngr = CheckpointManager(str(ckpt_dir))
        trainer = Trainer(cfg, model, variables["params"],
                          checkpoint_manager=mngr)
        start = 0
        if resume:
            start = trainer.restore() + 1
        hist = trainer.fit(batches_for, batches_for, start_epoch=start)
        mngr.wait()
        return hist, trainer

    straight, _ = run(tmp_path / "a", epochs=3)

    # Interrupted: 2 epochs, then a brand-new Trainer resumes for epoch 3.
    first, _ = run(tmp_path / "b", epochs=2)
    resumed, tr = run(tmp_path / "b", epochs=3, resume=True)
    assert len(resumed["train_loss"]) == 1
    np.testing.assert_allclose(resumed["train_loss"][0],
                               straight["train_loss"][2], rtol=1e-6)
    np.testing.assert_allclose(resumed["valid_loss"][0],
                               straight["valid_loss"][2], rtol=1e-6)
    tr.checkpoint_manager.close()


def test_uint8_batch_equals_preprocessed():
    """uint8 batches are normalized on-device inside the step, matching the
    host-preprocessed fp32 path exactly."""
    from mae_clip_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    cfg = tiny_cfg()
    model, variables, _ = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(8, 16, 16, 3)).astype(np.uint8)
    norm = ((raw.astype(np.float32) / 255.0 - IMAGENET_MEAN)
            / IMAGENET_STD).astype(np.float32)
    common = tiny_batch(rng)

    def one_step(image):
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables["params"]), tx,
            jax.random.PRNGKey(2))
        step = make_train_step(model, tx, cfg)
        batch = dict(common, image=jnp.asarray(image))
        _, m = step(state, batch)
        return float(m["loss"])

    np.testing.assert_allclose(one_step(raw), one_step(norm), rtol=1e-6)


def test_trainer_eval_hook():
    cfg = tiny_cfg(epochs=2)
    model, variables, _ = build(cfg)
    trainer = Trainer(cfg, model, variables["params"])
    rng = np.random.default_rng(5)
    calls = []

    def eval_fn(tr, epoch):
        calls.append(epoch)
        return {"eval/recall@1": 0.5 + epoch}

    hist = trainer.fit(_loaders(rng), _loaders(rng), eval_fn=eval_fn)
    assert calls == [0, 1]
    assert hist["eval/recall@1"] == [0.5, 1.5]


def test_gradient_accumulation_runs_and_approximates():
    """Legacy accumulation mode (true_global_contrastive=False): runs, loss
    finite, loss equals the mean of the per-microbatch losses (contrastive
    batch == microbatch in this mode)."""
    cfg = tiny_cfg()
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    state_a = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    step_acc = make_train_step(model, tx, cfg, accum_steps=2,
                               true_global_contrastive=False)
    state_a, m = step_acc(state_a, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(state_a.step) == 1

    # Oracle: average of per-microbatch losses (dropout off in eval-free
    # tiny cfg but train=True uses dropout rng; compare loss only loosely
    # by recomputing with the same per-microbatch rngs).
    rng = jax.random.fold_in(jax.random.PRNGKey(2), 0)
    losses = []
    for i in range(2):
        mb = {k: v[i * 4:(i + 1) * 4] for k, v in batch.items()}
        from mae_clip_tpu.ops.losses import clip_soft_ce_loss
        out = model.apply({"params": variables["params"]}, mb, train=True,
                          rngs={"dropout": jax.random.fold_in(
                              jax.random.fold_in(rng, i), 1)},
                          compute_contrastive=False)
        losses.append(float(clip_soft_ce_loss(
            out["image_embeddings"], out["text_embeddings"],
            cfg.temperature, mb["valid"])))
    np.testing.assert_allclose(float(m["loss"]), np.mean(losses), rtol=1e-5)


def _gradcache_cfg():
    return tiny_cfg(dropout=0.0,
                    mae=MAEConfig(enabled=True, mask_ratio=0.75,
                                  decoder_dim=16, decoder_depth=1,
                                  decoder_heads=2))


def test_gradcache_accumulation_matches_giant_batch():
    """GradCache accumulation (the default): loss, all metrics AND the
    updated parameters are EXACTLY those of a single giant-batch step —
    the full batch is the contrastive batch, the MAE masking is the same
    full-batch draw, microbatch MAE means compose exactly (equal static
    denominators). Dropout is off so rng bookkeeping can't hide behind it."""
    import optax

    cfg = _gradcache_cfg()
    model, variables, batch = build(cfg)
    # Plain SGD(lr=1): the param delta IS the gradient, so the comparison
    # checks grads directly. (Adam would amplify fp reduction-order noise
    # on near-zero grads into +-lr sign flips — see the mesh test note.)
    tx = optax.sgd(1.0)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    state_g = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    state_a = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    step_g = make_train_step(model, tx, cfg)
    step_a = make_train_step(model, tx, cfg, accum_steps=4)

    for _ in range(2):     # two steps: state must not drift either
        state_g, mg = step_g(state_g, batch)
        state_a, ma = step_a(state_a, batch)
        for key in mg:
            np.testing.assert_allclose(float(ma[key]), float(mg[key]),
                                       rtol=2e-6, err_msg=key)
    leaves_g = jax.tree_util.tree_leaves(state_g.params)
    leaves_a = jax.tree_util.tree_leaves(state_a.params)
    for a, g in zip(leaves_a, leaves_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g), atol=1e-5)


def test_gradcache_differs_from_legacy_approximation():
    """The per-microbatch approximation optimizes a DIFFERENT objective
    (contrastive batch == microbatch): its loss must not equal the
    giant-batch loss on generic data — guarding against the GradCache path
    silently degrading to the approximation."""
    cfg = _gradcache_cfg()
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    make = lambda: TrainState.create(copy(variables["params"]), tx,
                                     jax.random.PRNGKey(2))
    _, m_true = make_train_step(model, tx, cfg, accum_steps=4)(make(), batch)
    _, m_leg = make_train_step(model, tx, cfg, accum_steps=4,
                               true_global_contrastive=False)(make(), batch)
    assert abs(float(m_true["clip_loss"]) - float(m_leg["clip_loss"])) > 1e-4


def _bn_tower_setup():
    """A SHALLOW BatchNorm tower (the resnet50 architecture cut to one
    bottleneck stage via CLIPModel.resnet_shape — a full random-init
    resnet50 is numerically chaotic: fp32 reduction-order noise amplifies
    to O(1) through its 53 BN divisions, measured 4.0 abs / 3e-5 even at
    f64) with dropout off, batch = two IDENTICAL halves: each microbatch
    then has exactly the full batch's BN statistics, so the
    per-microbatch-normalization accumulation semantics coincide with
    the giant-batch step and the two arms must agree to fp tolerance."""
    cfg = Config(model_name="resnet50", compute_dtype="float32", size=32,
                 dropout=0.0, batch_size=4, text_trainable=False,
                 pretrained=False, max_length=16, image_embedding=32)
    model = CLIPModel(cfg, text_config=TINY_TEXT,
                      resnet_shape=((1,), (8,)))
    rng = np.random.default_rng(3)
    half_img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    half_ids = rng.integers(2, 64, size=(2, 10)).astype(np.int32)
    batch = {
        "image": jnp.asarray(np.concatenate([half_img, half_img])),
        "input_ids": jnp.asarray(np.concatenate([half_ids, half_ids])),
        "attention_mask": jnp.ones((4, 10), dtype=jnp.int32),
        "valid": jnp.ones((4,), dtype=bool),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    assert "batch_stats" in variables
    return cfg, model, variables, batch


def test_gradcache_accum_with_batchnorm_matches_giant_batch():
    """VERDICT r4 #5: accum_steps>1 with the BatchNorm tower must RUN (it
    raised NotImplementedError through round 4) and carry torch
    gradient-accumulation semantics. On duplicated-halves data the
    giant-batch step is the exact oracle for loss, grads (via SGD(1.0)
    param deltas) — and the running stats follow the sequential
    double-EMA law s2 = 1.9*s1 - 0.9*s0 (momentum 0.9)."""
    import optax

    cfg, model, variables, batch = _bn_tower_setup()
    tx = optax.sgd(1.0)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    make = lambda: TrainState.create(copy(variables["params"]), tx,
                                     jax.random.PRNGKey(2),
                                     copy(variables["batch_stats"]))
    state_g, mg = make_train_step(model, tx, cfg)(make(), batch)
    state_a, ma = make_train_step(model, tx, cfg, accum_steps=2)(
        make(), batch)
    np.testing.assert_allclose(float(ma["loss"]), float(mg["loss"]),
                               rtol=2e-6)
    for a, g in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g), atol=2e-5)

    # Running stats: giant batch does ONE EMA update s1 = 0.9*s0 + 0.1*mu;
    # accumulation does TWO sequential updates with the same per-layer
    # batch stats (identical halves + pass-1 params fixed), so
    # s2 = 0.81*s0 + 0.19*mu = 1.9*s1 - 0.9*s0 — expressible in
    # observables without re-deriving mu.
    s0_l = jax.tree_util.tree_leaves(variables["batch_stats"])
    s1_l = jax.tree_util.tree_leaves(state_g.batch_stats)
    s2_l = jax.tree_util.tree_leaves(state_a.batch_stats)
    moved = 0.0
    for s0, s1, s2 in zip(s0_l, s1_l, s2_l):
        expect = 1.9 * np.asarray(s1) - 0.9 * np.asarray(s0)
        np.testing.assert_allclose(np.asarray(s2), expect,
                                   rtol=1e-4, atol=1e-5)
        moved += float(np.abs(np.asarray(s1) - np.asarray(s0)).sum())
    assert moved > 0.0     # the stats really did update


def test_legacy_accum_with_batchnorm_runs_and_updates_stats():
    """Legacy (per-microbatch contrastive) accumulation on the BN tower:
    runs, loss finite, running stats updated sequentially."""
    cfg, model, variables, batch = _bn_tower_setup()
    tx = make_optimizer(cfg, variables["params"])
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = TrainState.create(copy(variables["params"]), tx,
                              jax.random.PRNGKey(2),
                              copy(variables["batch_stats"]))
    state, m = make_train_step(model, tx, cfg, accum_steps=2,
                               true_global_contrastive=False)(state, batch)
    assert np.isfinite(float(m["loss"]))
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(after, before))


def test_metric_fetch_batching_matches_per_step():
    """Deferred (device-side) metric draining must produce the identical
    count-weighted epoch meter as per-step fetching — it only changes WHEN
    the scalars cross to host, never what is averaged."""
    rng_seed = 11
    results = {}
    for fetch_every in (1, 64):
        cfg = tiny_cfg(metric_fetch_every=fetch_every)
        model, variables, _ = build(cfg)
        trainer = Trainer(cfg, model,
                          jax.tree_util.tree_map(jnp.copy,
                                                 variables["params"]))
        rng = np.random.default_rng(rng_seed)
        meter = trainer.train_epoch(_loaders(rng, n_batches=5)())
        results[fetch_every] = (meter.avg, meter.count)
    assert results[1][1] == results[64][1]
    np.testing.assert_allclose(results[64][0], results[1][0], rtol=1e-7)


def test_ema_params_update_and_eval_selection():
    """ema_decay>0: the step maintains new_ema = d*ema + (1-d)*params over
    TRAINABLE leaves (frozen leaves alias), eval runs on the EMA weights
    when ema_eval, and raw-params eval is recovered with ema_eval=false."""
    from mae_clip_tpu.train.loop import (make_eval_step, make_train_step,
                                         _eval_variables)
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    d = 0.5
    cfg = tiny_cfg(ema_decay=d)
    model, variables, _ = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx,
                              jax.random.PRNGKey(0), ema=True)
    expected = jax.tree_util.tree_map(np.asarray, state.params)
    step = make_train_step(model, tx, cfg)

    rng = np.random.default_rng(21)
    for _ in range(3):
        state, metrics = step(state, tiny_batch(rng))
        assert np.isfinite(float(metrics["loss"]))
        expected = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            expected, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(b), a, rtol=2e-6, atol=1e-7)
    # EMA differs from the live params after optimizer movement...
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(state.ema_params))]
    assert max(diffs) > 0
    # ...the frozen text tower's EMA leaves stay identical to its params.
    for a, b in zip(
            jax.tree_util.tree_leaves(state.params["text_encoder"]),
            jax.tree_util.tree_leaves(state.ema_params["text_encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Eval-variable selection.
    assert _eval_variables(state, cfg)["params"] is state.ema_params
    cfg_raw = tiny_cfg(ema_decay=d, ema_eval=False)
    assert _eval_variables(state, cfg_raw)["params"] is state.params
    batch = tiny_batch(rng)
    m_ema = make_eval_step(model, cfg)(state, batch)
    m_raw = make_eval_step(model, cfg_raw)(state, batch)
    assert float(m_ema["loss"]) != float(m_raw["loss"])


def test_trainer_ema_fit_and_checkpoint_roundtrip(tmp_path):
    """Trainer with ema_decay>0: fit maintains the EMA tree, the whole
    state (incl. EMA) roundtrips through Orbax, and load_variables serves
    the EMA weights for an ema_eval config."""
    from mae_clip_tpu.train.checkpoint import (CheckpointManager,
                                               abstract_like,
                                               load_variables)

    cfg = tiny_cfg(ema_decay=0.9, epochs=1,
                   logdir=str(tmp_path / "logs"),
                   checkpoints=str(tmp_path / "ckpt"))
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(3)
    mngr = CheckpointManager(cfg.checkpoints)
    trainer = Trainer(cfg, model, variables["params"],
                      checkpoint_manager=mngr)
    trainer.fit(_loaders(rng), _loaders(rng, n_batches=2))
    mngr.wait()
    assert trainer.state.ema_params is not None

    restored, _ = mngr.restore(abstract_like(trainer.state))
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.ema_params),
                    jax.tree_util.tree_leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    served = load_variables(cfg.checkpoints, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.ema_params),
                    jax.tree_util.tree_leaves(served["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    raw = load_variables(cfg.checkpoints, cfg.replace(ema_eval=False))
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(raw["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# SigLIP objective through the train step
# ---------------------------------------------------------------------------

def test_train_step_siglip_learns_scale_and_bias():
    """contrastive_loss='siglip': loss decreases and the learnable
    logit_scale/logit_bias params exist, receive grads, and move."""
    cfg = tiny_cfg(contrastive_loss="siglip")
    model, variables, batch = build(cfg)
    assert "logit_scale" in variables["params"]
    assert np.allclose(float(variables["params"]["logit_scale"]),
                       np.log(10.0))
    assert np.allclose(float(variables["params"]["logit_bias"]), -10.0)

    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)
    scale0 = float(state.params["logit_scale"])
    bias0 = float(state.params["logit_bias"])
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert float(state.params["logit_scale"]) != scale0
    assert float(state.params["logit_bias"]) != bias0


def test_gradcache_siglip_matches_giant_batch():
    """GradCache with SigLIP: the loss-only scale/bias grads are injected
    after pass 2, so accumulated params still exactly match one giant-batch
    step (including the scalars)."""
    import optax

    cfg = _gradcache_cfg().replace(contrastive_loss="siglip")
    model, variables, batch = build(cfg)
    tx = optax.sgd(1.0)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    state_g = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    state_a = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    step_g = make_train_step(model, tx, cfg)
    step_a = make_train_step(model, tx, cfg, accum_steps=4)

    state_g, mg = step_g(state_g, batch)
    state_a, ma = step_a(state_a, batch)
    for key in mg:
        np.testing.assert_allclose(float(ma[key]), float(mg[key]),
                                   rtol=2e-6, err_msg=key)
    paths_a = {jax.tree_util.keystr(p): x for p, x in
               jax.tree_util.tree_leaves_with_path(state_a.params)}
    paths_g = {jax.tree_util.keystr(p): x for p, x in
               jax.tree_util.tree_leaves_with_path(state_g.params)}
    assert paths_a.keys() == paths_g.keys()
    for k in paths_a:
        # rtol absorbs fp reduction-order noise on the large post-SGD(lr=1)
        # magnitudes (SigLIP's exp(scale)=10 logits make grads ~10x the
        # softmax objective's).
        np.testing.assert_allclose(np.asarray(paths_a[k]),
                                   np.asarray(paths_g[k]), rtol=1e-5,
                                   atol=1e-5, err_msg=k)


def test_mesh_step_siglip_matches_single_device():
    """The full sharded train step with contrastive_loss='siglip' (ring
    ppermute global loss) produces the same loss as the local step."""
    cfg = tiny_cfg(contrastive_loss="siglip", global_contrastive=True)
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    state1 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    state1, m1 = make_train_step(model, tx, cfg)(state1, batch)

    mesh = create_mesh(8, 1)
    state2 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    state2, m2 = make_train_step(model, tx, cfg, mesh=mesh)(state2, batch)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               atol=1e-5)


def test_learnable_temperature_init_parity_and_learns():
    """learnable_temperature=True: at init the loss equals the fixed-T loss
    (same objective, T = cfg.temperature), and the logit_scale param
    receives gradients and moves."""
    cfg_f = tiny_cfg(temperature=0.5)
    cfg_l = tiny_cfg(temperature=0.5, learnable_temperature=True)
    model_f, var_f, batch = build(cfg_f)
    model_l, var_l, _ = build(cfg_l)
    assert "logit_scale" in var_l["params"]
    assert np.allclose(float(var_l["params"]["logit_scale"]), np.log(2.0))

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    tx_f = make_optimizer(cfg_f, var_f["params"])
    tx_l = make_optimizer(cfg_l, var_l["params"])
    state_f = TrainState.create(copy(var_f["params"]), tx_f,
                                jax.random.PRNGKey(2))
    state_l = TrainState.create(copy(var_l["params"]), tx_l,
                                jax.random.PRNGKey(2))
    _, mf = make_train_step(model_f, tx_f, cfg_f)(state_f, batch)
    state_l2, ml = make_train_step(model_l, tx_l, cfg_l)(state_l, batch)
    np.testing.assert_allclose(float(ml["loss"]), float(mf["loss"]),
                               rtol=1e-6)
    scale0 = np.log(2.0)
    for _ in range(4):
        state_l2, ml = make_train_step(model_l, tx_l, cfg_l)(state_l2, batch)
    assert float(state_l2.params["logit_scale"]) != scale0


def test_learnable_temperature_param_clamped_post_update():
    """CLIP's clamp lives on the PARAM (post-update), not just the forward:
    an overshoot past log(100) is pulled back so the gradient to
    logit_scale can never be permanently zeroed by the forward min()."""
    cfg = tiny_cfg(learnable_temperature=True)
    model, variables, batch = build(cfg)
    params = dict(variables["params"])
    params["logit_scale"] = jnp.asarray(np.log(500.0), jnp.float32)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)
    for _ in range(2):
        state, m = step(state, batch)
        assert float(state.params["logit_scale"]) <= np.log(100.0) + 1e-6
        assert np.isfinite(float(m["loss"]))


# ---------------------------------------------------------------------------
# Standard CLIP objective (contrastive_loss="clip") through the train step
# ---------------------------------------------------------------------------

def test_train_step_clip_objective_learns():
    """contrastive_loss='clip' + learnable_temperature: the hard-CE loss
    decreases, logit_scale exists and moves, and loss at init equals
    -log-softmax of the normalized similarities (finite, > 0)."""
    cfg = tiny_cfg(contrastive_loss="clip", learnable_temperature=True,
                   temperature=0.5)
    model, variables, batch = build(cfg)
    assert "logit_scale" in variables["params"]
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)
    scale0 = float(state.params["logit_scale"])
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    assert float(state.params["logit_scale"]) != scale0


def test_gradcache_clip_objective_matches_giant_batch():
    """GradCache accumulation with the hard-CE objective (+ learnable T)
    still reproduces the exact giant-batch step."""
    import optax

    cfg = _gradcache_cfg().replace(contrastive_loss="clip",
                                   learnable_temperature=True)
    model, variables, batch = build(cfg)
    tx = optax.sgd(0.1)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    state_g = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    state_a = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    state_g, mg = make_train_step(model, tx, cfg)(state_g, batch)
    state_a, ma = make_train_step(model, tx, cfg, accum_steps=4)(state_a,
                                                                 batch)
    for key in mg:
        np.testing.assert_allclose(float(ma[key]), float(mg[key]),
                                   rtol=2e-6, err_msg=key)
    for (pa, xa), (pg, xg) in zip(
            jax.tree_util.tree_leaves_with_path(state_a.params),
            jax.tree_util.tree_leaves_with_path(state_g.params)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xg),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_mesh_step_clip_objective_matches_single_device():
    """Sharded train step with the hard-CE global loss (all-gather +
    axis_index labels) == the local step's loss."""
    cfg = tiny_cfg(contrastive_loss="clip", global_contrastive=True)
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    state1 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    state1, m1 = make_train_step(model, tx, cfg)(state1, batch)

    mesh = create_mesh(8, 1)
    state2 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    state2, m2 = make_train_step(model, tx, cfg, mesh=mesh)(state2, batch)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               atol=1e-5)


def test_mesh_step_clip_objective_chunked_matches_single_device():
    """loss_chunk_size routes the hard objective through its streaming
    one-pass form under the mesh; result still matches the local step."""
    cfg = tiny_cfg(contrastive_loss="clip", global_contrastive=True,
                   loss_chunk_size=3)
    model, variables, batch = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    cfg_local = cfg.replace(loss_chunk_size=0)
    state1 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    state1, m1 = make_train_step(model, tx, cfg_local)(state1, batch)

    mesh = create_mesh(8, 1)
    state2 = TrainState.create(copy(variables["params"]), tx,
                               jax.random.PRNGKey(2))
    state2, m2 = make_train_step(model, tx, cfg, mesh=mesh)(state2, batch)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               atol=1e-5)


def test_clip_step_device_side_augmentation():
    """NHWC uint8 sources LARGER than cfg.size route through the in-step
    RandomResizedCrop+flip (train) / deterministic resize (eval) — the
    same device-side augmentation path the MAE objective uses, now shared
    by the joint/CLIP step (train.loop._prep_images)."""
    cfg = tiny_cfg()
    model, variables, _ = build(cfg)       # init at model geometry (16x16)
    rng_np = np.random.default_rng(5)
    aug_batch = {
        "image": jnp.array(rng_np.integers(
            0, 256, size=(8, 24, 24, 3)).astype(np.uint8)),
        "input_ids": jnp.array(rng_np.integers(
            0, 64, size=(8, 12)).astype(np.int32)),
        "attention_mask": jnp.ones((8, 12), dtype=jnp.int32),
        "valid": jnp.ones((8,), dtype=bool),
    }
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg)
    losses = []
    for _ in range(6):
        state, m = step(state, aug_batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses

    # Eval is a deterministic full-frame resize: identical metrics twice.
    eval_step = make_eval_step(model, cfg)
    m1 = eval_step(state, aug_batch)
    m2 = eval_step(state, aug_batch)
    np.testing.assert_array_equal(np.asarray(m1["loss"]),
                                  np.asarray(m2["loss"]))


def test_prep_images_float_passthrough_any_geometry():
    """Float inputs are already-preprocessed model inputs and must pass
    through _prep_images UNTOUCHED at any geometry — only uint8 NHWC
    sources (the aug staging convention) may be cropped/resized/renormalized.
    Regression: a float batch at non-default geometry (parity tests feed
    48x48 into a fully-convolutional ResNet with cfg.size=224) was being
    routed through RandomResizedCrop + /255 + ImageNet normalize."""
    from mae_clip_tpu.train.loop import _prep_images

    cfg = tiny_cfg()                      # cfg.size == 16
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 8, 3)).astype(np.float32))
    out = _prep_images(imgs, jax.random.PRNGKey(0), train=True, cfg=cfg)
    assert out is imgs                    # identity, not just value-equal
    out_eval = _prep_images(imgs, jax.random.PRNGKey(0), train=False, cfg=cfg)
    assert out_eval is imgs


def test_mid_epoch_step_checkpoint_resume_bit_identical(tmp_path):
    """checkpoint_every_steps: a run killed mid-epoch resumes from the
    rolling step checkpoint (restore_mid_epoch + fit(skip_batches)) and
    finishes with EXACTLY the params of the uninterrupted run."""
    from mae_clip_tpu.train.checkpoint import StepCheckpointManager

    n_batches = 6
    every = 2

    def batches_for(epoch):
        rng = np.random.default_rng(200 + epoch)
        return iter([{k: np.asarray(v) for k, v in tiny_batch(rng).items()}
                     for _ in range(n_batches)])

    def make_trainer(ckpt_dir):
        cfg = tiny_cfg(epochs=1, checkpoints=str(ckpt_dir),
                       checkpoint_every_steps=every)
        model, variables, _ = build(cfg)
        mngr = StepCheckpointManager(str(ckpt_dir))
        return Trainer(cfg, model, variables["params"],
                       step_checkpoint_manager=mngr)

    # Uninterrupted run: one full epoch.
    straight = make_trainer(tmp_path / "a")
    straight.fit(batches_for, lambda e: iter([]), epochs=1)
    straight.step_checkpoint_manager.wait()

    # Interrupted run: stop after 4 batches (2 step-checkpoints written).
    broken = make_trainer(tmp_path / "b")
    broken._epoch = 0
    it = batches_for(0)
    broken.train_epoch(iter([next(it) for _ in range(4)]))
    broken.step_checkpoint_manager.wait()
    assert broken.step_checkpoint_manager.latest_step() is not None

    # Fresh process analogue: brand-new Trainer restores mid-epoch.
    resumed = make_trainer(tmp_path / "b")
    epoch, done = resumed.restore_mid_epoch()
    assert (epoch, done) == (0, 4)
    resumed.fit(batches_for, lambda e: iter([]), epochs=1,
                start_epoch=epoch, skip_batches=done)

    for (pa, xa), (pb, xb) in zip(
            jax.tree_util.tree_leaves_with_path(resumed.state.params),
            jax.tree_util.tree_leaves_with_path(straight.state.params)):
        np.testing.assert_array_equal(
            np.asarray(xa), np.asarray(xb),
            err_msg=jax.tree_util.keystr(pa))
    assert int(resumed.state.step) == int(straight.state.step) == n_batches
    straight.step_checkpoint_manager.close()
    resumed.step_checkpoint_manager.close()
    broken.step_checkpoint_manager.close()


def test_early_stop_patience_halts_on_plateau():
    """cfg.early_stop_patience stops fit() when valid loss plateaus.

    lr=0 freezes the params, so epoch 0 is the only best; patience=2
    must halt after epoch 2 of a 10-epoch budget and record best_epoch.
    Patience 0 (default, reference behavior main.py:103-126) runs the
    full budget.
    """
    cfg = tiny_cfg(epochs=10, lr=0.0, head_lr=0.0, image_encoder_lr=0.0,
                   text_encoder_lr=0.0, early_stop_patience=2,
                   checkpoint_every=0)
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(0)
    trainer = Trainer(cfg, model, variables["params"])
    history = trainer.fit(_loaders(rng), _loaders(rng, n_batches=2))
    assert history["stopped_early"] is True
    assert len(history["train_loss"]) == 3          # epochs 0, 1, 2
    assert history["best_epoch"] == 0
    assert history["best_valid_loss"] == history["valid_loss"][0]

    cfg2 = tiny_cfg(epochs=3, lr=0.0, head_lr=0.0, image_encoder_lr=0.0,
                    text_encoder_lr=0.0, checkpoint_every=0)
    model2, variables2, _ = build(cfg2)
    trainer2 = Trainer(cfg2, model2, variables2["params"])
    history2 = trainer2.fit(_loaders(rng), _loaders(rng, n_batches=2))
    assert "stopped_early" not in history2
    assert len(history2["train_loss"]) == 3


def test_eval_every_cadence():
    """cfg.eval_every gates eval_fn to every-N epochs plus best-val and
    final epochs; timing scalars are always emitted.

    With eval_every=3 over 6 epochs, eval_fn must fire at epochs 2 and
    5 ((epoch+1) % 3 == 0; 5 is also final) and nowhere else — not on
    best-val epochs, which would fire every epoch of an improving run.
    eval_every=1 (default) fires every epoch — the pre-cadence behavior.
    """
    cfg = tiny_cfg(epochs=6, lr=0.0, head_lr=0.0, image_encoder_lr=0.0,
                   text_encoder_lr=0.0, eval_every=3, checkpoint_every=0)
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(0)
    trainer = Trainer(cfg, model, variables["params"])
    fired = []
    history = trainer.fit(
        _loaders(rng), _loaders(rng, n_batches=2),
        eval_fn=lambda tr, ep: (fired.append(ep) or {"eval/recall@1": 0.5}))
    assert fired == [2, 5]
    assert history["eval/recall@1"] == [0.5] * 2

    cfg1 = tiny_cfg(epochs=3, lr=0.0, head_lr=0.0, image_encoder_lr=0.0,
                    text_encoder_lr=0.0, checkpoint_every=0)
    model1, variables1, _ = build(cfg1)
    trainer1 = Trainer(cfg1, model1, variables1["params"])
    fired1 = []
    trainer1.fit(_loaders(rng), _loaders(rng, n_batches=2),
                 eval_fn=lambda tr, ep: (fired1.append(ep) or {}))
    assert fired1 == [0, 1, 2]


def test_fit_emits_phase_timing_scalars(tmp_path):
    """Trainer.fit writes time/train_s, time/valid_s, time/ckpt_s each
    epoch and time/eval_s on eval epochs (epoch-tail attribution)."""
    import json
    from mae_clip_tpu.train.metrics import MetricWriter

    cfg = tiny_cfg(epochs=2, logdir=str(tmp_path / "logs"),
                   checkpoint_every=0)
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(0)
    writer = MetricWriter(cfg.logdir)
    trainer = Trainer(cfg, model, variables["params"], writer=writer)
    trainer.fit(_loaders(rng), _loaders(rng, n_batches=2),
                eval_fn=lambda tr, ep: {"eval/recall@1": 0.0})
    writer.close()
    rows = [json.loads(l) for l in
            open(f"{cfg.logdir}/metrics.jsonl")]
    assert len(rows) == 2
    for row in rows:
        for key in ("time/train_s", "time/valid_s", "time/ckpt_s",
                    "time/eval_s"):
            assert key in row and row[key] >= 0.0
