"""Multi-step training-trajectory parity vs the torch reference.

The strongest offline parity proof available without datasets: export a
random-init reference composite to ``.pth``, train the SAME weights for 6
identical fp32 steps (distinct fixed batches, dropout off, single-group
AdamW lr=1e-3 wd=1e-3, frozen text tower — the reference recipe,
main.py:51-67,101-107) in torch and in the JAX twin, and require the
per-step loss sequences AND the final parameters to match. This pins
loss math + gradients + optimizer/weight-decay/LR semantics end to end,
through the real checkpoint-interop path.

Uses the ViT image tower (the reference's commented-out variant,
modules.py:20-26): it is LayerNorm-only, so fp32 cross-framework
gradient agreement holds to ~1e-6 over the whole trajectory — unlike the
50-layer BatchNorm ResNet trunk, whose fp32 gradients disagree at up to
~30% on near-zero entries for conditioning reasons unrelated to
correctness (measured; see test_resnet_interop.py::
test_training_curve_parity_vs_torch, which therefore runs the ResNet leg
of this proof in fp64).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from torch import nn
import torch.nn.functional as F
import transformers

from mae_clip_tpu.config import Config
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.models.vit import ViTConfig

from test_resnet_interop import TorchProjectionHead, _Wrap
from test_vit_interop import TorchTimmViT

TEXT = dict(vocab_size=99, dim=32, n_layers=1, n_heads=4,
            hidden_dim=64, max_position_embeddings=64)
VIT = dict(img=32, patch=8, dim=24, depth=2, heads=3)


class TorchViTComposite(nn.Module):
    """Reference module tree (CLIP.py:17-21 naming) with the ViT tower."""

    def __init__(self, text_cfg):
        super().__init__()
        self.image_encoder = _Wrap(TorchTimmViT(**VIT))
        self.text_encoder = _Wrap(transformers.DistilBertModel(text_cfg))
        self.image_projection = TorchProjectionHead(VIT["dim"],
                                                    projection_dim=16,
                                                    dropout=0.0)
        self.text_projection = TorchProjectionHead(TEXT["dim"],
                                                   projection_dim=16,
                                                   dropout=0.0)

    def forward(self, images, ids, mask):
        """Reference forward + loss math (CLIP.py:23-43) at T=1."""
        imf = self.image_encoder.model(images)
        txf = self.text_encoder.model(
            input_ids=ids, attention_mask=mask).last_hidden_state[:, 0]
        ie, te = self.image_projection(imf), self.text_projection(txf)
        logits = te @ ie.T
        targets = F.softmax((ie @ ie.T + te @ te.T) / 2, dim=-1)
        tl = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
        il = (-targets.T * F.log_softmax(logits.T, dim=-1)).sum(1)
        return ((il + tl) / 2).mean()


def test_pth_trajectory_parity_vs_torch_fp32(tmp_path):
    from mae_clip_tpu.interop.torch_export import export_clip_state_dict
    from mae_clip_tpu.interop.torch_import import (import_clip_state_dict,
                                                   load_pth_state_dict)
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    torch.manual_seed(11)
    tcfg = transformers.DistilBertConfig(dropout=0.0, attention_dropout=0.0,
                                         attn_implementation="eager", **TEXT)
    composite = TorchViTComposite(tcfg)
    for mod in composite.modules():
        if isinstance(mod, nn.Dropout):
            mod.p = 0.0
    # Reference freezes the text tower (modules.py:35,42-43).
    for p in composite.text_encoder.model.parameters():
        p.requires_grad = False

    # The real interop path: random-init composite -> .pth on disk -> import.
    pth = tmp_path / "random_init.pth"
    torch.save(composite.state_dict(), pth)

    # Six distinct fixed batches — a trajectory over varying data, not one
    # batch memorized.
    rng = np.random.default_rng(5)
    b, seq, steps = 4, 13, 6
    batches = []
    for i in range(steps):
        mask = np.ones((b, seq), dtype=np.int64)
        mask[i % b, seq - 1 - (i % 5):] = 0          # ragged rows too
        batches.append((
            rng.normal(size=(b, 32, 32, 3)).astype(np.float32),
            rng.integers(0, TEXT["vocab_size"], size=(b, seq)
                         ).astype(np.int32),
            mask))

    # --- torch arm: the reference train loop (main.py:51-67,101-103) ----
    composite.train()
    opt = torch.optim.AdamW(
        [p for p in composite.parameters() if p.requires_grad],
        lr=1e-3, weight_decay=1e-3)
    torch_losses = []
    for images, ids, mask in batches:
        opt.zero_grad()
        loss = composite(torch.tensor(images.transpose(0, 3, 1, 2)),
                         torch.tensor(ids, dtype=torch.long),
                         torch.tensor(mask))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # --- JAX arm: import the .pth, run the jitted production step -------
    sd = load_pth_state_dict(str(pth))
    variables = import_clip_state_dict(sd, model_name="vit_s16")

    cfg = Config(model_name="vit_s16", image_embedding=VIT["dim"],
                 projection_dim=16, size=32, compute_dtype="float32",
                 dropout=0.0, recipe="py", lr=1e-3, weight_decay=1e-3,
                 text_trainable=False, frozen_text_eval_mode=False,
                 global_contrastive=False)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(dropout=0.0, attention_dropout=0.0,
                                     **TEXT),
        vit_config=ViTConfig(image_size=VIT["img"], patch_size=VIT["patch"],
                             dim=VIT["dim"], depth=VIT["depth"],
                             n_heads=VIT["heads"], pos_embed="learned",
                             pool="cls"))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, cfg)
    jax_losses = []
    for images, ids, mask in batches:
        state, metrics = step(state, {
            "image": jnp.asarray(images),
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask.astype(np.int32)),
            "valid": jnp.ones((b,), dtype=bool)})
        jax_losses.append(float(metrics["loss"]))

    # Per-step losses: fp32 forward agreement is ~1e-6; AdamW's
    # m/sqrt(v) amplifies near-zero-gradient noise along the trajectory,
    # so the tolerance widens with step index. Real defects sit far above:
    # wrong loss/grads break step 1, wrong decay/bias-correction step 2.
    for i, (j, t) in enumerate(zip(jax_losses, torch_losses)):
        rtol = (1e-5, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3)[i]
        assert np.isclose(j, t, rtol=rtol, atol=1e-7), (i, j, t, jax_losses,
                                                        torch_losses)
    # The trajectory moved (the optimizer is doing real work).
    assert abs(torch_losses[-1] - torch_losses[0]) > 1e-3

    # --- final parameters match, key for key, through the export path ---
    final_sd = export_clip_state_dict({"params": state.params},
                                      model_name="vit_s16")
    torch_final = {k: v.detach().numpy() for k, v in
                   composite.state_dict().items()}
    # Tolerance for trained leaves: Adam normalizes every update to ~lr
    # per coordinate (m/sqrt(v)), so on coordinates whose true gradient is
    # near zero, fp32 cross-framework noise flips the update SIGN and the
    # frameworks drift apart at up to ~2*lr per step regardless of
    # correctness — the bound after 6 steps at lr=1e-3 is ~1.2e-2
    # (measured worst: 7.4e-3, on qkv biases). Coordinates with real
    # gradients track far tighter (weight relL2 ~1e-3). Optimizer-semantics
    # bugs (wrong decay coupling, bias correction) are caught by the
    # per-step LOSS ladder above, not this check.
    sq_d = sq_w = 0.0
    compared = 0
    for k, want in torch_final.items():
        got = np.asarray(final_sd[k], dtype=np.float32)
        # Frozen text leaves must be EXACTLY the initial bytes on both
        # sides (no update, no decay — torch skips requires_grad=False).
        if k.startswith("text_encoder."):
            np.testing.assert_array_equal(got, want, err_msg=k)
        else:
            np.testing.assert_allclose(got, want, atol=1.2e-2, rtol=1e-2,
                                       err_msg=k)
            sq_d += float(np.sum((got - want) ** 2))
            sq_w += float(np.sum(want ** 2))
        compared += 1
    assert compared == len(torch_final) and compared > 20
    # Globally the trained parameter vector agrees to ~0.3%: the noisy
    # near-zero-gradient coordinates are a measure-zero tail, not drift.
    assert np.sqrt(sq_d / sq_w) < 5e-3, np.sqrt(sq_d / sq_w)
