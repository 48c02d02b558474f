"""CLIP loss parity vs a torch oracle of the reference math (CLIP.py:34-43)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mae_clip_tpu.ops.losses import (clip_soft_ce_loss, cross_entropy_soft,
                                     mae_reconstruction_loss)


def torch_reference_loss(image_embeddings, text_embeddings, temperature):
    """Independent torch oracle of the reference loss formula."""
    img = torch.tensor(image_embeddings, dtype=torch.float32)
    txt = torch.tensor(text_embeddings, dtype=torch.float32)
    logits = (txt @ img.T) / temperature
    images_similarity = img @ img.T
    texts_similarity = txt @ txt.T
    targets = F.softmax((images_similarity + texts_similarity) / 2 * temperature,
                        dim=-1)
    texts_loss = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
    images_loss = (-targets.T * F.log_softmax(logits.T, dim=-1)).sum(1)
    return ((images_loss + texts_loss) / 2.0).mean().item()


@pytest.mark.parametrize("temperature", [1.0, 0.07, 2.5])
def test_loss_matches_torch_oracle(temperature):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(8, 16)).astype(np.float32)
    txt = rng.normal(size=(8, 16)).astype(np.float32)
    expected = torch_reference_loss(img, txt, temperature)
    got = float(clip_soft_ce_loss(jnp.array(img), jnp.array(txt), temperature))
    assert np.allclose(got, expected, atol=1e-5), (got, expected)


def test_loss_hand_computed_2x2():
    # Identity-like case: identical towers, T=1.
    img = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    txt = img.copy()
    expected = torch_reference_loss(img, txt, 1.0)
    got = float(clip_soft_ce_loss(jnp.array(img), jnp.array(txt), 1.0))
    assert np.allclose(got, expected, atol=1e-6)


def test_ragged_tail_masking():
    """Padded batch with valid mask must equal the unpadded loss."""
    rng = np.random.default_rng(1)
    img = rng.normal(size=(5, 8)).astype(np.float32)
    txt = rng.normal(size=(5, 8)).astype(np.float32)
    full = float(clip_soft_ce_loss(jnp.array(img), jnp.array(txt), 1.0))

    pad = 3
    img_p = np.concatenate([img, rng.normal(size=(pad, 8)).astype(np.float32)])
    txt_p = np.concatenate([txt, rng.normal(size=(pad, 8)).astype(np.float32)])
    valid = jnp.array([True] * 5 + [False] * pad)
    masked = float(clip_soft_ce_loss(jnp.array(img_p), jnp.array(txt_p), 1.0,
                                     valid=valid))
    assert np.allclose(masked, full, atol=1e-5), (masked, full)


def test_targets_receive_gradients():
    """The reference does NOT detach targets; gradients must flow through the
    similarity matrices. Compare JAX grads against torch autograd."""
    rng = np.random.default_rng(2)
    img = rng.normal(size=(4, 6)).astype(np.float32)
    txt = rng.normal(size=(4, 6)).astype(np.float32)

    t_img = torch.tensor(img, requires_grad=True)
    t_txt = torch.tensor(txt, requires_grad=True)
    logits = (t_txt @ t_img.T) / 1.0
    targets = F.softmax((t_img @ t_img.T + t_txt @ t_txt.T) / 2, dim=-1)
    texts_loss = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
    images_loss = (-targets.T * F.log_softmax(logits.T, dim=-1)).sum(1)
    loss = ((images_loss + texts_loss) / 2).mean()
    loss.backward()

    g_img, g_txt = jax.grad(
        lambda a, b: clip_soft_ce_loss(a, b, 1.0), argnums=(0, 1)
    )(jnp.array(img), jnp.array(txt))
    assert np.allclose(np.asarray(g_img), t_img.grad.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(g_txt), t_txt.grad.numpy(), atol=1e-5)


def test_cross_entropy_soft_matches_reference_helper():
    rng = np.random.default_rng(3)
    preds = rng.normal(size=(4, 4)).astype(np.float32)
    targets = rng.uniform(size=(4, 4)).astype(np.float32)
    t_loss = (-torch.tensor(targets)
              * F.log_softmax(torch.tensor(preds), dim=-1)).sum(1)
    got = cross_entropy_soft(jnp.array(preds), jnp.array(targets))
    assert np.allclose(np.asarray(got), t_loss.numpy(), atol=1e-6)
    got_mean = cross_entropy_soft(jnp.array(preds), jnp.array(targets), "mean")
    assert np.allclose(float(got_mean), t_loss.mean().item(), atol=1e-6)


def test_mae_loss_masked_only():
    rng = np.random.default_rng(4)
    pred = rng.normal(size=(2, 8, 12)).astype(np.float32)
    target = rng.normal(size=(2, 8, 12)).astype(np.float32)
    mask = np.zeros((2, 8), dtype=np.float32)
    mask[:, :6] = 1.0
    got = float(mae_reconstruction_loss(jnp.array(pred), jnp.array(target),
                                        jnp.array(mask), norm_pix=False))
    per_patch = ((pred - target) ** 2).mean(-1)
    expected = (per_patch * mask).sum() / mask.sum()
    assert np.allclose(got, expected, atol=1e-6)

    # Changing an UNMASKED patch's prediction must not change the loss.
    pred2 = pred.copy()
    pred2[:, 6:] += 100.0
    got2 = float(mae_reconstruction_loss(jnp.array(pred2), jnp.array(target),
                                         jnp.array(mask), norm_pix=False))
    assert np.allclose(got, got2, atol=1e-6)


def test_mae_loss_norm_pix():
    rng = np.random.default_rng(5)
    pred = rng.normal(size=(2, 4, 8)).astype(np.float32)
    target = rng.normal(size=(2, 4, 8)).astype(np.float32)
    mask = np.ones((2, 4), dtype=np.float32)
    got = float(mae_reconstruction_loss(jnp.array(pred), jnp.array(target),
                                        jnp.array(mask), norm_pix=True))
    t = torch.tensor(target)
    mean = t.mean(dim=-1, keepdim=True)
    var = t.var(dim=-1, keepdim=True, unbiased=False)
    t_norm = (t - mean) / (var + 1e-6) ** 0.5
    expected = ((torch.tensor(pred) - t_norm) ** 2).mean(-1).mean().item()
    assert np.allclose(got, expected, atol=1e-5)


# ---------------------------------------------------------------------------
# SigLIP (arXiv:2303.15343) — beyond-reference sigmoid objective
# ---------------------------------------------------------------------------

from mae_clip_tpu.ops.losses import siglip_loss  # noqa: E402


def torch_siglip_loss(img, txt, logit_scale, logit_bias):
    """Independent torch oracle of SigLIP eq. 1."""
    zi = F.normalize(torch.tensor(img, dtype=torch.float32), dim=-1)
    zt = F.normalize(torch.tensor(txt, dtype=torch.float32), dim=-1)
    logits = torch.exp(torch.tensor(logit_scale)) * zi @ zt.T + logit_bias
    labels = 2.0 * torch.eye(zi.shape[0]) - 1.0
    return -F.logsigmoid(labels * logits).sum() / zi.shape[0]


@pytest.mark.parametrize("scale,bias", [(np.log(10.0), -10.0), (0.5, 0.0)])
def test_siglip_matches_torch_oracle(scale, bias):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(8, 16)).astype(np.float32)
    txt = rng.normal(size=(8, 16)).astype(np.float32)
    expected = float(torch_siglip_loss(img, txt, scale, bias))
    got = float(siglip_loss(jnp.array(img), jnp.array(txt),
                            jnp.asarray(scale, jnp.float32),
                            jnp.asarray(bias, jnp.float32)))
    assert np.allclose(got, expected, atol=1e-5), (got, expected)


def test_siglip_valid_masking():
    """Padded rows contribute nothing: loss(padded batch) == loss(true batch)."""
    rng = np.random.default_rng(1)
    img = rng.normal(size=(5, 8)).astype(np.float32)
    txt = rng.normal(size=(5, 8)).astype(np.float32)
    scale = jnp.asarray(np.log(10.0), jnp.float32)
    bias = jnp.asarray(-10.0, jnp.float32)

    unpadded = float(siglip_loss(jnp.array(img), jnp.array(txt), scale, bias))

    pad = np.zeros((3, 8), np.float32)
    img_p = jnp.array(np.concatenate([img, pad]))
    txt_p = jnp.array(np.concatenate([txt, pad + 7.0]))
    valid = jnp.array([True] * 5 + [False] * 3)
    padded = float(siglip_loss(img_p, txt_p, scale, bias, valid))
    assert np.allclose(padded, unpadded, atol=1e-6), (padded, unpadded)


def test_siglip_grads_match_torch():
    """Grads w.r.t. embeddings AND the learnable scale/bias match autograd."""
    rng = np.random.default_rng(2)
    img = rng.normal(size=(6, 8)).astype(np.float32)
    txt = rng.normal(size=(6, 8)).astype(np.float32)
    scale0, bias0 = 0.7, -2.0

    ti = torch.tensor(img, requires_grad=True)
    tt = torch.tensor(txt, requires_grad=True)
    ts = torch.tensor(scale0, requires_grad=True)
    tb = torch.tensor(bias0, requires_grad=True)
    zi, zt = F.normalize(ti, dim=-1), F.normalize(tt, dim=-1)
    logits = torch.exp(ts) * zi @ zt.T + tb
    labels = 2.0 * torch.eye(6) - 1.0
    (-F.logsigmoid(labels * logits).sum() / 6).backward()

    grads = jax.grad(
        lambda i, t, s, b: siglip_loss(i, t, s, b),
        argnums=(0, 1, 2, 3))(jnp.array(img), jnp.array(txt),
                              jnp.asarray(scale0, jnp.float32),
                              jnp.asarray(bias0, jnp.float32))
    for got, exp in zip(grads, (ti.grad, tt.grad, ts.grad, tb.grad)):
        np.testing.assert_allclose(np.asarray(got), exp.numpy(), atol=1e-5)


def test_temperature_of_clamps_at_100():
    from mae_clip_tpu.ops.losses import temperature_of
    assert np.allclose(float(temperature_of(jnp.asarray(0.0))), 1.0)
    assert np.allclose(float(temperature_of(jnp.asarray(np.log(1 / 0.07)))),
                       0.07, rtol=1e-5)
    # CLIP's clamp: exp(s) never exceeds 100, so T floors at 0.01.
    assert np.allclose(float(temperature_of(jnp.asarray(np.log(1e6)))), 0.01)


# ---------------------------------------------------------------------------
# Standard CLIP-paper objective (contrastive_loss="clip"): hard targets,
# L2-normalized embeddings (arXiv:2103.00020 fig. 3)
# ---------------------------------------------------------------------------

from mae_clip_tpu.ops.losses import clip_hard_ce_loss  # noqa: E402


def torch_hard_clip_loss(img, txt, temperature, want_grads=False):
    """Independent torch oracle of the CLIP-paper pseudocode."""
    t_img = torch.tensor(img, requires_grad=want_grads)
    t_txt = torch.tensor(txt, requires_grad=want_grads)
    imn = F.normalize(t_img, p=2, dim=-1)
    txn = F.normalize(t_txt, p=2, dim=-1)
    logits = (txn @ imn.T) / temperature
    labels = torch.arange(img.shape[0])
    loss = (F.cross_entropy(logits, labels)
            + F.cross_entropy(logits.T, labels)) / 2
    if want_grads:
        loss.backward()
        return loss.item(), t_img.grad.numpy(), t_txt.grad.numpy()
    return loss.item()


@pytest.mark.parametrize("temperature", [1.0, 0.07])
def test_hard_ce_matches_torch_oracle(temperature):
    rng = np.random.default_rng(20)
    img = rng.normal(size=(8, 16)).astype(np.float32)
    txt = rng.normal(size=(8, 16)).astype(np.float32)
    expected = torch_hard_clip_loss(img, txt, temperature)
    got = float(clip_hard_ce_loss(jnp.array(img), jnp.array(txt),
                                  temperature))
    assert np.allclose(got, expected, rtol=1e-5, atol=1e-5), (got, expected)


def test_hard_ce_grads_match_torch():
    rng = np.random.default_rng(21)
    img = rng.normal(size=(6, 8)).astype(np.float32)
    txt = rng.normal(size=(6, 8)).astype(np.float32)
    _, g_img_t, g_txt_t = torch_hard_clip_loss(img, txt, 0.5, want_grads=True)
    g_img, g_txt = jax.grad(
        lambda a, b: clip_hard_ce_loss(a, b, 0.5), argnums=(0, 1)
    )(jnp.array(img), jnp.array(txt))
    np.testing.assert_allclose(np.asarray(g_img), g_img_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_txt), g_txt_t, atol=1e-5)


def test_hard_ce_ragged_tail_masking():
    """Padded rows must change neither the loss nor the valid-row grads."""
    rng = np.random.default_rng(22)
    img = rng.normal(size=(5, 8)).astype(np.float32)
    txt = rng.normal(size=(5, 8)).astype(np.float32)
    full = float(clip_hard_ce_loss(jnp.array(img), jnp.array(txt), 1.0))
    g_full = jax.grad(lambda a: clip_hard_ce_loss(a, jnp.array(txt), 1.0))(
        jnp.array(img))

    pad = 3
    img_p = np.concatenate([img,
                            rng.normal(size=(pad, 8)).astype(np.float32)])
    txt_p = np.concatenate([txt,
                            rng.normal(size=(pad, 8)).astype(np.float32)])
    valid = jnp.array([True] * 5 + [False] * pad)
    masked = float(clip_hard_ce_loss(jnp.array(img_p), jnp.array(txt_p), 1.0,
                                     valid=valid))
    assert np.allclose(masked, full, atol=1e-5), (masked, full)
    g_masked = jax.grad(
        lambda a: clip_hard_ce_loss(a, jnp.array(txt_p), 1.0, valid=valid)
    )(jnp.array(img_p))
    np.testing.assert_allclose(np.asarray(g_masked)[:5], np.asarray(g_full),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_masked)[5:], 0.0, atol=1e-6)
