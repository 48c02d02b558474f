"""Optimizer recipes and the plateau scheduler vs torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mae_clip_tpu.config import Config
from mae_clip_tpu.train.optim import (ReduceLROnPlateau, get_lr_scale,
                                      make_optimizer, set_lr_scale)


def _fake_clip_params():
    k = lambda *s: jnp.ones(s, jnp.float32)
    return {
        "image_encoder": {"block_0": {"kernel": k(4, 4)}},
        "text_encoder": {"model": {"layer_0": {"kernel": k(4, 4)}}},
        "image_projection": {"projection": {"kernel": k(4, 4)}},
        "text_projection": {"projection": {"kernel": k(4, 4)}},
    }


def test_py_recipe_freezes_text_tower():
    cfg = Config(recipe="py", trainable=True, text_trainable=False)
    params = _fake_clip_params()
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["text_encoder"]["model"]["layer_0"]
                         ["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["image_encoder"]["block_0"]
                         ["kernel"]).max()) > 0.0
    assert float(jnp.abs(updates["image_projection"]["projection"]
                         ["kernel"]).max()) > 0.0


def test_adamw_update_matches_torch():
    """Single-group AdamW (py recipe) vs torch.optim.AdamW, several steps."""
    cfg = Config(recipe="py", lr=1e-3, weight_decay=1e-3, text_trainable=True)
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 4)).astype(np.float32)
    params = {"image_projection": {"projection": {"kernel": jnp.array(w0)}}}
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    t_w = torch.tensor(w0.copy(), requires_grad=True)
    t_opt = torch.optim.AdamW([t_w], lr=1e-3, weight_decay=1e-3)

    for step in range(5):
        g = rng.normal(size=(4, 4)).astype(np.float32)
        grads = {"image_projection": {"projection": {"kernel": jnp.array(g)}}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        t_opt.zero_grad()
        t_w.grad = torch.tensor(g)
        t_opt.step()

    np.testing.assert_allclose(
        np.asarray(params["image_projection"]["projection"]["kernel"]),
        t_w.detach().numpy(), atol=1e-6, rtol=1e-5)


def test_notebook_recipe_group_lrs():
    cfg = Config(recipe="notebook", head_lr=1e-3, image_encoder_lr=1e-4,
                 text_encoder_lr=1e-5, weight_decay=1e-3,
                 trainable=True, text_trainable=True)
    params = _fake_clip_params()
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    # Uniform unit grads: first-step AdamW update magnitude ~= lr per group.
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    zero_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, zero_params)
    head = float(jnp.abs(updates["image_projection"]["projection"]
                         ["kernel"]).mean())
    image = float(jnp.abs(updates["image_encoder"]["block_0"]
                          ["kernel"]).mean())
    text = float(jnp.abs(updates["text_encoder"]["model"]["layer_0"]
                         ["kernel"]).mean())
    assert np.isclose(head / image, 10.0, rtol=1e-3)
    assert np.isclose(image / text, 10.0, rtol=1e-3)


def test_lr_scale_roundtrip():
    cfg = Config(recipe="py")
    params = _fake_clip_params()
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    assert get_lr_scale(opt_state) == 1.0
    opt_state = set_lr_scale(opt_state, 0.25)
    assert get_lr_scale(opt_state) == 0.25
    # Scaled update must be 4x smaller.
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd_scaled, _ = tx.update(grads, opt_state, zeros)
    opt_state2 = set_lr_scale(tx.init(params), 1.0)
    upd_full, _ = tx.update(grads, opt_state2, zeros)
    a = float(jnp.abs(upd_scaled["image_projection"]["projection"]
                      ["kernel"]).mean())
    b = float(jnp.abs(upd_full["image_projection"]["projection"]
                      ["kernel"]).mean())
    assert np.isclose(a * 4, b, rtol=1e-5)


def test_plateau_scheduler_matches_torch():
    """Scale trajectory == torch ReduceLROnPlateau LR trajectory."""
    metrics = [10.0, 9.0, 9.0, 9.0, 9.0, 8.0, 8.0, 8.0, 8.0, 8.0, 7.9999]
    ours = ReduceLROnPlateau(patience=2, factor=0.5)
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", patience=2, factor=0.5)
    for m in metrics:
        scale = ours.step(m)
        sched.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        assert np.isclose(scale, torch_lr), (m, scale, torch_lr)


def test_plateau_state_roundtrip():
    s = ReduceLROnPlateau(patience=1, factor=0.1)
    s.step(5.0); s.step(6.0); s.step(6.0)
    d = s.state_dict()
    s2 = ReduceLROnPlateau(patience=1, factor=0.1)
    s2.load_state_dict(d)
    assert s2.step(6.0) == s.step(6.0)


def test_cosine_schedule_warmup_and_decay():
    """lr_schedule='cosine': linear warmup then cosine decay to 0, applied
    inside the jitted update via the optimizer count (MAE-paper schedule)."""
    from mae_clip_tpu.train.optim import base_lr_schedule, current_lr

    cfg = Config(recipe="py", lr=1e-3, lr_schedule="cosine",
                 warmup_steps=4, decay_steps=10, text_trainable=True)
    sched = base_lr_schedule(cfg, cfg.lr)
    # Warmup: 0 -> peak linearly over warmup_steps.
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(2)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4)), 1e-3, rtol=1e-6)
    # Cosine midpoint between warmup end (4) and decay_steps (10).
    np.testing.assert_allclose(float(sched(7)), 5e-4, rtol=1e-6)
    assert float(sched(10)) < 1e-9

    params = _fake_clip_params()
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # First update happens at count 0 => lr 0 => zero update everywhere.
    updates, opt_state = tx.update(grads, opt_state, params)
    assert all(float(jnp.abs(u).max()) == 0.0
               for u in jax.tree_util.tree_leaves(updates))
    # Subsequent updates are non-zero and track the schedule direction.
    updates, opt_state = tx.update(grads, opt_state, params)
    assert float(jnp.abs(
        updates["image_projection"]["projection"]["kernel"]).max()) > 0

    # current_lr evaluates the schedule host-side, composed with the
    # plateau scale.
    assert current_lr(cfg, opt_state, step=0) == 0.0
    np.testing.assert_allclose(current_lr(cfg, opt_state, step=4), 1e-3,
                               rtol=1e-6)
    half = set_lr_scale(opt_state, 0.5)
    np.testing.assert_allclose(current_lr(cfg, half, step=4), 5e-4,
                               rtol=1e-6)


def test_cosine_schedule_requires_decay_steps():
    import pytest
    cfg = Config(lr_schedule="cosine")
    with pytest.raises(ValueError, match="decay_steps"):
        make_optimizer(cfg, _fake_clip_params())
    with pytest.raises(ValueError, match="lr_schedule"):
        Config(lr_schedule="nope").validate()


def test_grad_clip_matches_torch_clip_grad_norm():
    """grad_clip_norm == torch ``clip_grad_norm_`` + AdamW over trainable
    params; frozen-tower grads (materialized by the joint backward, huge
    here on purpose) must NOT inflate the clip norm."""
    cfg = Config(recipe="py", lr=1e-3, weight_decay=1e-3, trainable=True,
                 text_trainable=False, grad_clip_norm=0.5)
    rng = np.random.default_rng(1)
    w_img = rng.normal(size=(4, 4)).astype(np.float32)
    w_frozen = rng.normal(size=(4, 4)).astype(np.float32)
    params = {
        "image_encoder": {"block_0": {"kernel": jnp.array(w_img)}},
        "text_encoder": {"model": {"layer_0": {"kernel": jnp.array(w_frozen)}}},
    }
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    t_w = torch.tensor(w_img.copy(), requires_grad=True)
    t_opt = torch.optim.AdamW([t_w], lr=1e-3, weight_decay=1e-3)

    for step in range(6):
        # alternate clip-active (big) and clip-inactive (small) steps
        g = rng.normal(size=(4, 4)).astype(np.float32) * (
            10.0 if step % 2 else 0.01)
        g_frozen = rng.normal(size=(4, 4)).astype(np.float32) * 100.0
        grads = {
            "image_encoder": {"block_0": {"kernel": jnp.array(g)}},
            "text_encoder": {"model": {"layer_0": {"kernel":
                                                   jnp.array(g_frozen)}}},
        }
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        t_opt.zero_grad()
        t_w.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([t_w], 0.5)
        t_opt.step()

    np.testing.assert_allclose(
        np.asarray(params["image_encoder"]["block_0"]["kernel"]),
        t_w.detach().numpy(), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(params["text_encoder"]["model"]["layer_0"]["kernel"]),
        w_frozen)


def test_grad_clip_composes_with_train_step_and_lr_scale():
    """grad_clip_norm>0 inserts a transform ahead of the chain: the jitted
    train step still runs, and the dynamic-LR-scale plumbing (which
    SEARCHES the chain state) still finds its slot."""
    from tests.test_train import build, tiny_batch, tiny_cfg

    cfg = tiny_cfg(grad_clip_norm=1.0, epochs=1)
    model, variables, _ = build(cfg)
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.state import TrainState

    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx,
                              jax.random.PRNGKey(0))
    assert get_lr_scale(state.opt_state) == 1.0
    state = state.replace(opt_state=set_lr_scale(state.opt_state, 0.5))
    assert get_lr_scale(state.opt_state) == 0.5

    step = make_train_step(model, tx, cfg)
    rng = np.random.default_rng(7)
    state, metrics = step(state, tiny_batch(rng))
    assert np.isfinite(float(metrics["loss"]))
    from mae_clip_tpu.train.optim import current_lr
    assert current_lr(cfg, state.opt_state) > 0


# ---------------------------------------------------------------------------
# Optimizer families (cfg.optimizer): lamb / lion
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


@pytest.mark.parametrize("name", ["lamb", "lion"])
def test_optimizer_family_updates_and_freezes(name):
    """Non-default inner optimizers still honor the frozen-text grouping
    and produce finite, nonzero updates for trainable groups."""
    cfg = Config(recipe="py", optimizer=name, trainable=True,
                 text_trainable=False)
    params = _fake_clip_params()
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 0.5), params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["text_encoder"]["model"]["layer_0"]
                         ["kernel"]).max()) == 0.0
    u = np.asarray(updates["image_projection"]["projection"]["kernel"])
    assert np.all(np.isfinite(u)) and np.abs(u).max() > 0.0


def test_lion_update_matches_optax_direct():
    """The chained/multi-transform wiring adds nothing on top of the raw
    optax.lion update for a single trainable group."""
    import optax
    cfg = Config(recipe="py", optimizer="lion", lr=1e-4,
                 weight_decay=1e-2, text_trainable=True)
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(4, 4)).astype(np.float32)
    params = {"image_projection": {"projection": {"kernel": jnp.array(w0)}}}
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    ref = optax.lion(learning_rate=1e-4, b1=0.9, b2=0.99, weight_decay=1e-2)
    ref_params = {"image_projection": {"projection": {"kernel": jnp.array(w0)}}}
    ref_state = ref.init(ref_params)

    for _ in range(3):
        g = rng.normal(size=(4, 4)).astype(np.float32)
        grads = {"image_projection": {"projection": {"kernel": jnp.array(g)}}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        ref_updates, ref_state = ref.update(grads, ref_state, ref_params)
        ref_params = jax.tree_util.tree_map(lambda p, u: p + u, ref_params,
                                            ref_updates)
    np.testing.assert_allclose(
        np.asarray(params["image_projection"]["projection"]["kernel"]),
        np.asarray(ref_params["image_projection"]["projection"]["kernel"]),
        atol=1e-7)


def test_unknown_optimizer_rejected():
    with pytest.raises(ValueError, match="optimizer"):
        Config(optimizer="sgd").validate()
