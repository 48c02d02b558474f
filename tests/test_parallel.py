"""Mesh-global contrastive loss == single-device loss on the same batch."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from mae_clip_tpu.ops.losses import (clip_soft_ce_loss,
                                     global_clip_soft_ce_loss)
from mae_clip_tpu.parallel.mesh import create_mesh, local_batch_size
from mae_clip_tpu.parallel.sharding import param_shardings


def _global_loss_fn(mesh, temperature=1.0):
    spec = P("data")
    fn = functools.partial(global_clip_soft_ce_loss,
                           temperature=temperature, axis_name="data")
    return shard_map(lambda i, t, v: fn(i, t, valid=v), mesh=mesh,
                     in_specs=(spec, spec, spec), out_specs=P())


def test_global_loss_matches_local():
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(0)
    img = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    valid = jnp.ones((16,), dtype=bool)

    local = clip_soft_ce_loss(img, txt, 1.0, valid)
    with mesh:
        global_ = _global_loss_fn(mesh)(img, txt, valid)
    np.testing.assert_allclose(float(global_), float(local), atol=1e-5)


def test_global_loss_with_padding():
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(1)
    img = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    valid = np.ones((16,), dtype=bool)
    valid[13:] = False  # ragged global tail
    valid = jnp.array(valid)

    local = clip_soft_ce_loss(img, txt, 1.0, valid)
    with mesh:
        global_ = _global_loss_fn(mesh)(img, txt, valid)
    np.testing.assert_allclose(float(global_), float(local), atol=1e-5)


def test_global_loss_gradients_match_local():
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(2)
    img = jnp.array(rng.normal(size=(8, 4)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(8, 4)).astype(np.float32))
    valid = jnp.ones((8,), dtype=bool)

    g_local = jax.grad(lambda a, b: clip_soft_ce_loss(a, b, 1.0, valid),
                       argnums=(0, 1))(img, txt)
    loss_fn = _global_loss_fn(mesh)
    with mesh:
        g_global = jax.grad(lambda a, b: loss_fn(a, b, valid),
                            argnums=(0, 1))(img, txt)
    for a, b in zip(g_local, g_global):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_global_loss_temperature():
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(3)
    img = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    valid = jnp.ones((16,), dtype=bool)
    local = clip_soft_ce_loss(img, txt, 0.07, valid)
    with mesh:
        global_ = _global_loss_fn(mesh, temperature=0.07)(img, txt, valid)
    np.testing.assert_allclose(float(global_), float(local), rtol=1e-5,
                               atol=1e-5)


def test_mesh_shapes_and_local_batch():
    mesh = create_mesh(4, 2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    assert local_batch_size(32, mesh) == 8
    mesh8 = create_mesh(-1, 1)
    assert mesh8.shape["data"] == 8


def test_tp_sharding_rules():
    mesh = create_mesh(4, 2)
    params = {
        "layer_0": {
            "attention": {"q_lin": {"kernel": jnp.zeros((8, 8)),
                                    "bias": jnp.zeros((8,))}},
            "ffn_lin1": {"kernel": jnp.zeros((8, 32))},
            "ffn_lin2": {"kernel": jnp.zeros((32, 8))},
            "sa_layer_norm": {"scale": jnp.ones((8,))},
        },
    }
    sh = param_shardings(params, mesh)
    assert sh["layer_0"]["attention"]["q_lin"]["kernel"].spec == P(None, "model")
    assert sh["layer_0"]["attention"]["q_lin"]["bias"].spec == P()
    assert sh["layer_0"]["ffn_lin1"]["kernel"].spec == P(None, "model")
    assert sh["layer_0"]["ffn_lin2"]["kernel"].spec == P("model", None)
    assert sh["layer_0"]["sa_layer_norm"]["scale"].spec == P()


def _chunked_loss_fn(mesh, temperature=1.0, chunk_size=4):
    from mae_clip_tpu.ops.losses import global_clip_soft_ce_loss_chunked
    spec = P("data")
    fn = functools.partial(global_clip_soft_ce_loss_chunked,
                           temperature=temperature, axis_name="data",
                           chunk_size=chunk_size)
    return shard_map(lambda i, t, v: fn(i, t, valid=v), mesh=mesh,
                     in_specs=(spec, spec, spec), out_specs=P())


def test_chunked_loss_matches_unchunked():
    """Blockwise (memory-barrier) loss == unchunked, incl. ragged chunks."""
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(10)
    img = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    valid = np.ones((16,), dtype=bool)
    valid[14:] = False
    valid = jnp.array(valid)
    local = clip_soft_ce_loss(img, txt, 0.5, valid)
    with mesh:
        for chunk in (4, 5, 16, 64):   # even, ragged, exact, oversize
            got = _chunked_loss_fn(mesh, 0.5, chunk)(img, txt, valid)
            np.testing.assert_allclose(float(got), float(local), atol=1e-5)


def test_chunked_loss_gradients_match():
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(11)
    img = jnp.array(rng.normal(size=(8, 4)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(8, 4)).astype(np.float32))
    valid = jnp.ones((8,), dtype=bool)
    g_local = jax.grad(lambda a, b: clip_soft_ce_loss(a, b, 1.0, valid),
                       argnums=(0, 1))(img, txt)
    fn = _chunked_loss_fn(mesh, 1.0, 3)
    with mesh:
        g_chunked = jax.grad(lambda a, b: fn(a, b, valid),
                             argnums=(0, 1))(img, txt)
    for a, b in zip(g_local, g_chunked):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_large_batch_mesh_recipe_end_to_end():
    """BASELINE.json config 5 as an executable pipeline: the
    large_batch_mesh_config recipe (global contrastive + chunked
    online-logsumexp loss + remat + gradient accumulation) runs a real
    train step over the 8-device mesh with tiny towers, and the loss is
    finite and decreases."""
    import dataclasses

    from mae_clip_tpu.config import MAEConfig, large_batch_mesh_config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.parallel.mesh import create_mesh
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    cfg = large_batch_mesh_config(
        batch_size=32, size=16, max_length=8, compute_dtype="float32",
        loss_chunk_size=4, dropout=0.0,
        mae=MAEConfig(enabled=True, mask_ratio=0.75, decoder_dim=16,
                      decoder_depth=1, decoder_heads=2))
    assert cfg.remat and cfg.global_contrastive and cfg.loss_chunk_size
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=64, dim=16, n_layers=1,
                                     n_heads=2, hidden_dim=32,
                                     max_position_embeddings=16),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2, pos_embed="sincos"))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(32, 16, 16, 3)
                                        ).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, size=(32, 8)
                                              ).astype(np.int32)),
        "attention_mask": jnp.ones((32, 8), jnp.int32),
        "valid": jnp.ones((32,), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), batch,
                           mask_rng=jax.random.PRNGKey(1))
    tx = make_optimizer(cfg, variables["params"])
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    mesh = create_mesh(8, 1)

    # GradCache accumulation (the default): over the mesh + chunked global
    # loss, the accumulated step's loss must EQUAL the giant-batch step's —
    # the recipe's "32k batch" is the true contrastive batch, not the
    # microbatch (dropout=0 above so the two steps' dropout rng recipes
    # can't differ).
    state_g = TrainState.create(copy(variables["params"]), tx,
                                jax.random.PRNGKey(2))
    _, m_giant = make_train_step(model, tx, cfg, mesh=mesh)(state_g, batch)

    state = TrainState.create(copy(variables["params"]), tx,
                              jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg, mesh=mesh, accum_steps=2)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch)
        if i == 0:
            np.testing.assert_allclose(float(metrics["clip_loss"]),
                                       float(m_giant["clip_loss"]),
                                       rtol=1e-5)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_zero1_opt_state_sharding_matches_replicated():
    """mesh.shard_opt_state=true (ZeRO-1): AdamW moments are sharded
    P('data') on their leading dim, values after several steps match the
    replicated-opt-state mesh run exactly (the update math is
    elementwise), and the moment leaves really live sharded."""
    import dataclasses

    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState
    from tests.test_train import build, tiny_batch, tiny_cfg

    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(12)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    states = {}
    for zero1 in (False, True):
        cfg = tiny_cfg(global_contrastive=True)
        cfg = cfg.replace(mesh=dataclasses.replace(
            cfg.mesh, shard_opt_state=zero1))
        model, variables, _ = build(cfg)
        tx = make_optimizer(cfg, variables["params"])
        state = TrainState.create(copy(variables["params"]), tx,
                                  jax.random.PRNGKey(2))
        step = make_train_step(model, tx, cfg, mesh=mesh)
        r = np.random.default_rng(12)          # same batches both arms
        for _ in range(3):
            state, metrics = step(state, tiny_batch(r))
            assert np.isfinite(float(metrics["loss"]))
        states[zero1] = state

    for a, b in zip(jax.tree_util.tree_leaves(states[False].params),
                    jax.tree_util.tree_leaves(states[True].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # Moments (leading dim divisible by 8) are physically sharded; the
    # step counter / LR scale scalars stay replicated.
    specs = [leaf.sharding.spec for leaf in
             jax.tree_util.tree_leaves(states[True].opt_state)
             if getattr(leaf, "ndim", 0) >= 1
             and leaf.shape[0] % 8 == 0 and leaf.shape[0] >= 8]
    assert specs and all(s == P("data") for s in specs)
    scalars = [leaf for leaf in
               jax.tree_util.tree_leaves(states[True].opt_state)
               if getattr(leaf, "ndim", None) == 0]
    assert scalars and all(s.sharding.spec == P() for s in scalars)


def test_zero1_state_checkpoint_roundtrip(tmp_path):
    """A ZeRO-1-sharded TrainState saves and restores through Orbax with
    exact values (restore lands unsharded; the next compiled step's
    in_shardings reshard it)."""
    import dataclasses

    from mae_clip_tpu.train.checkpoint import CheckpointManager, abstract_like
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState
    from tests.test_train import build, tiny_batch, tiny_cfg

    mesh = create_mesh(8, 1)
    cfg = tiny_cfg(global_contrastive=True)
    cfg = cfg.replace(mesh=dataclasses.replace(cfg.mesh,
                                               shard_opt_state=True))
    model, variables, _ = build(cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx,
                              jax.random.PRNGKey(2))
    step = make_train_step(model, tx, cfg, mesh=mesh)
    r = np.random.default_rng(13)
    state, _ = step(state, tiny_batch(r))

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(epoch=0, state=state, metrics={"valid_loss": 1.0})
    mngr.wait()
    restored, _ = mngr.restore(abstract_like(state), step=0)
    mngr.close()
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state steps again under the sharded executable
    restored, metrics = step(restored, tiny_batch(r))
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------
# Global SigLIP via the ppermute ring (no all-gather)
# ---------------------------------------------------------------------------

def _ring_siglip_fn(mesh):
    from mae_clip_tpu.ops.losses import global_siglip_loss
    spec = P("data")
    return shard_map(
        lambda i, t, v, s, b: global_siglip_loss(i, t, s, b, valid=v,
                                                 axis_name="data"),
        mesh=mesh, in_specs=(spec, spec, spec, P(), P()), out_specs=P())


def test_global_siglip_ring_matches_local():
    """Ring-rotated global SigLIP == local SigLIP on the concatenated batch
    (value AND grads, including the learnable scale/bias), with a ragged
    global tail masked."""
    from mae_clip_tpu.ops.losses import siglip_loss

    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(3)
    img = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    valid = np.ones((16,), dtype=bool)
    valid[14:] = False
    valid = jnp.array(valid)
    scale = jnp.asarray(np.log(10.0), jnp.float32)
    bias = jnp.asarray(-10.0, jnp.float32)

    local_val, local_grads = jax.value_and_grad(
        lambda i, t, s, b: siglip_loss(i, t, s, b, valid),
        argnums=(0, 1, 2, 3))(img, txt, scale, bias)
    with mesh:
        ring_val, ring_grads = jax.value_and_grad(
            lambda i, t, s, b: _ring_siglip_fn(mesh)(i, t, valid, s, b),
            argnums=(0, 1, 2, 3))(img, txt, scale, bias)

    np.testing.assert_allclose(float(ring_val), float(local_val), atol=1e-5)
    for rg, lg in zip(ring_grads, local_grads):
        np.testing.assert_allclose(np.asarray(rg), np.asarray(lg), atol=1e-5)


# ---------------------------------------------------------------------------
# Standard CLIP objective (hard targets), global forms
# ---------------------------------------------------------------------------

def _hard_loss_fn(mesh, temperature=1.0, chunk_size=0):
    from mae_clip_tpu.ops.losses import global_clip_hard_ce_loss
    spec = P("data")
    fn = functools.partial(global_clip_hard_ce_loss,
                           temperature=temperature, axis_name="data",
                           chunk_size=chunk_size)
    return shard_map(lambda i, t, v: fn(i, t, valid=v), mesh=mesh,
                     in_specs=(spec, spec, spec), out_specs=P())


def test_global_hard_ce_matches_local_with_padding_and_grads():
    from mae_clip_tpu.ops.losses import clip_hard_ce_loss
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(30)
    img = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    valid = np.ones((16,), dtype=bool)
    valid[13:] = False  # ragged global tail
    valid = jnp.array(valid)

    local = clip_hard_ce_loss(img, txt, 0.5, valid)
    g_local = jax.grad(lambda a, b: clip_hard_ce_loss(a, b, 0.5, valid),
                       argnums=(0, 1))(img, txt)
    loss_fn = _hard_loss_fn(mesh, temperature=0.5)
    with mesh:
        global_ = loss_fn(img, txt, valid)
        g_global = jax.grad(lambda a, b: loss_fn(a, b, valid),
                            argnums=(0, 1))(img, txt)
    np.testing.assert_allclose(float(global_), float(local), atol=1e-5)
    for a, b in zip(g_local, g_global):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_global_hard_ce_chunked_matches_unchunked():
    """Streaming (online-logsumexp) hard CE == direct, incl. a ragged final
    chunk (chunk_size=5 over a 16-wide global batch) and grads."""
    from mae_clip_tpu.ops.losses import clip_hard_ce_loss
    mesh = create_mesh(8, 1)
    rng = np.random.default_rng(31)
    img = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    txt = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
    valid = np.ones((16,), dtype=bool)
    valid[14:] = False
    valid = jnp.array(valid)

    local = clip_hard_ce_loss(img, txt, 0.07, valid)
    loss_fn = _hard_loss_fn(mesh, temperature=0.07, chunk_size=5)
    with mesh:
        chunked = loss_fn(img, txt, valid)
        g_chunked = jax.grad(lambda a, b: loss_fn(a, b, valid),
                             argnums=(0, 1))(img, txt)
    g_local = jax.grad(lambda a, b: clip_hard_ce_loss(a, b, 0.07, valid),
                       argnums=(0, 1))(img, txt)
    np.testing.assert_allclose(float(chunked), float(local), rtol=1e-5,
                               atol=1e-5)
    for a, b in zip(g_local, g_chunked):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_one_device_mesh_chunked_loss_matches_unchunked_local():
    """The 32k-on-one-chip recipe: a 1-DEVICE mesh with loss_chunk_size
    set must route through the chunked shard_map loss (collectives
    degenerate to identities) and produce exactly the unchunked local
    step's loss — this is what lets BASELINE.json config 5 execute at
    full batch on a single chip without 32k x 32k logits."""
    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.parallel.mesh import create_mesh
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    def build(chunk):
        cfg = Config(model_name="vit_s16", image_embedding=16,
                     projection_dim=8, size=16, max_length=8,
                     batch_size=16, compute_dtype="float32", dropout=0.0,
                     text_trainable=False, global_contrastive=True,
                     loss_chunk_size=chunk)
        model = CLIPModel(
            cfg,
            text_config=DistilBertConfig(vocab_size=64, dim=16, n_layers=1,
                                         n_heads=2, hidden_dim=32,
                                         max_position_embeddings=16),
            vit_config=ViTConfig(image_size=16, patch_size=8, dim=16,
                                 depth=1, n_heads=2, pos_embed="sincos"))
        return cfg, model

    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.normal(size=(16, 16, 16, 3)
                                        ).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, size=(16, 8)
                                              ).astype(np.int32)),
        "attention_mask": jnp.ones((16, 8), jnp.int32),
        "valid": jnp.asarray([True] * 14 + [False] * 2),
    }

    cfg, model = build(chunk=4)
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg, variables["params"])
    one_dev = create_mesh(1, 1, devices=jax.devices()[:1])
    losses = {}
    for name, (c, mesh) in {
        "chunked_1dev": (4, one_dev),
        "local_unchunked": (0, None),
    }.items():
        cfg_i, model_i = build(chunk=c)
        tx_i = make_optimizer(cfg_i, variables["params"])
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables["params"]),
            tx_i, jax.random.PRNGKey(2))
        step = make_train_step(model_i, tx_i, cfg_i, mesh=mesh)
        _, metrics = step(state, batch)
        losses[name] = float(metrics["clip_loss"])
    np.testing.assert_allclose(losses["chunked_1dev"],
                               losses["local_unchunked"], rtol=1e-6)

    # And GradCache accumulation composes with the 1-device chunked path
    # (the exact single-chip 32k recipe: accum microbatches + chunked
    # full-batch objective).
    cfg_a, model_a = build(chunk=4)
    cfg_a = cfg_a.replace(accum_steps=4)
    tx_a = make_optimizer(cfg_a, variables["params"])
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, variables["params"]),
        tx_a, jax.random.PRNGKey(2))
    step_a = make_train_step(model_a, tx_a, cfg_a, mesh=one_dev,
                             accum_steps=4)
    _, m_a = step_a(state, batch)
    np.testing.assert_allclose(float(m_a["clip_loss"]),
                               losses["local_unchunked"], rtol=1e-6)
