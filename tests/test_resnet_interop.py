"""ResNet50 parity + full reference-checkpoint (.pth) import roundtrip.

The torch oracle below reproduces the reference composite's EXACT state_dict
layout (reference CLIP.py:9-21: ``image_encoder.model.*`` is a
timm/torchvision ResNet50 trunk, ``text_encoder.model.*`` an HF DistilBERT,
``image_projection``/``text_projection`` the heads from modules.py:55-76) so
``import_clip_state_dict`` is exercised on real names, and model outputs are
compared at fp32 ("reference checkpoints drop in unchanged").
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
from mae_clip_tpu.interop.torch_import import (import_clip_state_dict,
                                               import_resnet50)
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.models.resnet import ResNet, resnet50


class TorchBottleneck(nn.Module):
    """torchvision-layout bottleneck (state_dict names conv1..3, bn1..3,
    downsample.0/.1)."""

    def __init__(self, cin, width, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(width * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class TorchResNet50(nn.Module):
    """torchvision/timm state_dict-compatible head-less ResNet50."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for stage, (n, w) in enumerate(zip([3, 4, 6, 3],
                                           [64, 128, 256, 512]), start=1):
            blocks = []
            for b in range(n):
                stride = 2 if (stage > 1 and b == 0) else 1
                blocks.append(TorchBottleneck(cin, w, stride, b == 0))
                cin = w * 4
            setattr(self, f"layer{stage}", nn.Sequential(*blocks))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = stage(x)
        return x.mean(dim=(2, 3))


class TorchProjectionHead(nn.Module):
    def __init__(self, embedding_dim, projection_dim=256, dropout=0.1):
        super().__init__()
        self.projection = nn.Linear(embedding_dim, projection_dim)
        self.gelu = nn.GELU()
        self.fc = nn.Linear(projection_dim, projection_dim)
        self.dropout = nn.Dropout(dropout)
        self.layer_norm = nn.LayerNorm(projection_dim)

    def forward(self, x):
        projected = self.projection(x)
        y = self.fc(self.gelu(projected))
        y = self.dropout(y)
        return self.layer_norm(y + projected)


class _Wrap(nn.Module):
    def __init__(self, model):
        super().__init__()
        self.model = model


class TorchReferenceComposite(nn.Module):
    """Exact reference module tree (CLIP.py:17-21 naming)."""

    def __init__(self, text_cfg):
        super().__init__()
        self.image_encoder = _Wrap(TorchResNet50())
        self.text_encoder = _Wrap(transformers.DistilBertModel(text_cfg))
        self.image_projection = TorchProjectionHead(2048)
        self.text_projection = TorchProjectionHead(768)


SMALL_TEXT = dict(vocab_size=99, dim=768, n_layers=1, n_heads=12,
                  hidden_dim=128, max_position_embeddings=64)


@pytest.fixture(scope="module")
def torch_composite():
    torch.manual_seed(0)
    tcfg = transformers.DistilBertConfig(dropout=0.0, attention_dropout=0.0,
                                         attn_implementation="eager",
                                         **SMALL_TEXT)
    m = TorchReferenceComposite(tcfg).eval()
    # Randomize BN running stats so eval-mode parity actually tests them.
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.8, 1.2)
    return m


def test_resnet50_forward_parity(torch_composite):
    params, stats = import_resnet50(
        torch_composite.state_dict(), prefix="image_encoder.model.")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        expected = torch_composite.image_encoder.model(
            torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    model = resnet50()
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.array(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expected, atol=3e-4,
                               rtol=1e-3)


def test_full_pth_import_loss_parity(torch_composite, tmp_path):
    """torch.save -> load_pth -> import -> identical CLIP loss at fp32."""
    pth = tmp_path / "checkpoint_1.pth"
    torch.save(torch_composite.state_dict(), pth)

    from mae_clip_tpu.interop.torch_import import load_pth_state_dict
    sd = load_pth_state_dict(str(pth))
    variables = import_clip_state_dict(sd, model_name="resnet50")

    cfg = Config(model_name="resnet50", compute_dtype="float32")
    model = CLIPModel(cfg, text_config=DistilBertConfig(**SMALL_TEXT))

    rng = np.random.default_rng(1)
    b = 4
    images = rng.normal(size=(b, 64, 64, 3)).astype(np.float32)
    ids = rng.integers(0, 99, size=(b, 13)).astype(np.int32)
    mask = np.ones((b, 13), dtype=np.int64)
    mask[2, 7:] = 0

    # torch side: the reference forward math (CLIP.py:23-43), eval mode.
    with torch.no_grad():
        t = torch_composite
        imf = t.image_encoder.model(torch.tensor(images.transpose(0, 3, 1, 2)))
        txf = t.text_encoder.model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask)).last_hidden_state[:, 0]
        ie, te = t.image_projection(imf), t.text_projection(txf)
        logits = te @ ie.T
        targets = F.softmax((ie @ ie.T + te @ te.T) / 2, dim=-1)
        tl = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
        il = (-targets.T * F.log_softmax(logits.T, dim=-1)).sum(1)
        expected_loss = ((il + tl) / 2).mean().item()

    batch = {"image": jnp.array(images), "input_ids": jnp.array(ids),
             "attention_mask": jnp.array(mask.astype(np.int32))}
    out = model.apply(variables, batch, train=False)
    got_loss = float(out["loss"])
    assert np.isclose(got_loss, expected_loss, atol=5e-4), (
        got_loss, expected_loss)

    # Embedding-level parity too (tighter signal than the scalar loss).
    np.testing.assert_allclose(np.asarray(out["image_embeddings"]),
                               ie.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["text_embeddings"]),
                               te.numpy(), atol=5e-4, rtol=1e-3)


def test_export_roundtrip(torch_composite, tmp_path):
    """import -> export -> import is exact, and the exported .pth loads
    back into the torch reference composite with zero mismatch."""
    import torch as _torch
    from mae_clip_tpu.interop.torch_export import (export_clip_state_dict,
                                                   save_pth)
    from mae_clip_tpu.interop.torch_import import load_pth_state_dict

    sd0 = {k: v.detach().numpy() for k, v in
           torch_composite.state_dict().items()}
    variables = import_clip_state_dict(sd0, model_name="resnet50")
    exported = export_clip_state_dict(variables, model_name="resnet50")

    for k, v in sd0.items():
        if k.endswith("num_batches_tracked"):
            continue
        assert k in exported, f"missing key {k}"
        np.testing.assert_array_equal(exported[k], v, err_msg=k)

    # torch.load path + strict load_state_dict into the reference tree.
    p = tmp_path / "exported.pth"
    save_pth(exported, str(p))
    loaded = {k: _torch.tensor(v) for k, v in
              load_pth_state_dict(str(p)).items()}
    missing, unexpected = torch_composite.load_state_dict(loaded,
                                                          strict=False)
    assert not [m for m in missing if "num_batches_tracked" not in m]
    assert not unexpected


def test_training_curve_parity_vs_torch(tmp_path):
    """Train the SAME weights for 4 steps in both frameworks on the same
    fixed batch with the reference recipe (single-group AdamW lr=1e-3
    wd=1e-3, frozen text via requires_grad, BN in train mode, dropout 0)
    and require matching loss curves. This pins grads + optimizer + loss +
    BN-train normalization jointly, end to end (reference: main.py:51-67
    train_epoch, main.py:101-103 optimizer).

    Runs in float64: the fp32 gradients of a 50-layer BN-train tower are
    ill-conditioned (fp64 cross-framework gradient agreement is ~1e-12
    while fp32 shows up to ~30% on individual near-zero entries — measured
    torch-vs-jax AND reproducible torch-f32-vs-f64), and AdamW's m/sqrt(v)
    turns that noise into sign flips, so fp32 multi-step curves diverge for
    reasons unrelated to correctness. lr is 1e-4 (not the recipe's 1e-3,
    which is pinned in test_config.py): at 1e-3 from random init the loss
    spikes 2.2 -> 67 and even 1e-12 seed differences amplify chaotically
    through the trajectory."""
    jax.config.update("jax_enable_x64", True)
    try:
        torch.manual_seed(3)
        tcfg = transformers.DistilBertConfig(
            dropout=0.0, attention_dropout=0.0,
            attn_implementation="eager", **SMALL_TEXT)
        composite = TorchReferenceComposite(tcfg).double()
        for mod in composite.modules():
            if isinstance(mod, nn.Dropout):
                mod.p = 0.0
        # Reference freezes the text tower (modules.py:35,42-43).
        for p in composite.text_encoder.model.parameters():
            p.requires_grad = False

        rng = np.random.default_rng(7)
        b = 4
        images = rng.normal(size=(b, 48, 48, 3))
        ids = rng.integers(0, 99, size=(b, 13)).astype(np.int32)
        mask = np.ones((b, 13), dtype=np.int64)
        mask[1, 9:] = 0

        def torch_loss():
            t = composite
            imf = t.image_encoder.model(
                torch.tensor(images.transpose(0, 3, 1, 2)))
            txf = t.text_encoder.model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask)).last_hidden_state[:, 0]
            ie, te = t.image_projection(imf), t.text_projection(txf)
            logits = te @ ie.T
            targets = F.softmax((ie @ ie.T + te @ te.T) / 2, dim=-1)
            tl = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
            il = (-targets.T * F.log_softmax(logits.T, dim=-1)).sum(1)
            return ((il + tl) / 2).mean()

        composite.train()
        opt = torch.optim.AdamW(
            [p for p in composite.parameters() if p.requires_grad],
            lr=1e-4, weight_decay=1e-3)
        torch_losses = []
        for _ in range(4):
            opt.zero_grad()
            loss = torch_loss()
            loss.backward()
            opt.step()
            torch_losses.append(float(loss.detach()))

        # --- ours: import the SAME initial weights and repeat -------------
        from mae_clip_tpu.train.loop import make_train_step
        from mae_clip_tpu.train.optim import make_optimizer
        from mae_clip_tpu.train.state import TrainState

        torch.manual_seed(3)
        init = TorchReferenceComposite(tcfg)   # identical init
        sd = {k: v.detach().numpy() for k, v in init.state_dict().items()}
        variables = import_clip_state_dict(sd, model_name="resnet50")
        to64 = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)
        variables = to64(variables)

        cfg = Config(model_name="resnet50", compute_dtype="float64",
                     param_dtype="float64", dropout=0.0, recipe="py",
                     lr=1e-4, text_trainable=False,
                     frozen_text_eval_mode=False)
        model = CLIPModel(cfg, text_config=DistilBertConfig(
            dropout=0.0, attention_dropout=0.0, **SMALL_TEXT))
        tx = make_optimizer(cfg, variables["params"])
        state = TrainState.create(variables["params"], tx,
                                  jax.random.PRNGKey(0),
                                  batch_stats=variables.get("batch_stats"))
        step = make_train_step(model, tx, cfg)
        batch = {"image": jnp.asarray(images, jnp.float64),
                 "input_ids": jnp.array(ids),
                 "attention_mask": jnp.array(mask.astype(np.int32)),
                 "valid": jnp.ones((b,), dtype=bool)}
        jax_losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            jax_losses.append(float(metrics["loss"]))

        # Per-step tolerance ladder: Adam's update g/sqrt(v) is RELATIVELY
        # sensitive on near-zero-gradient coordinates, so even the ~1e-12
        # fp64 gradient agreement amplifies along the trajectory (measured
        # ~2e-3 rel by step 4). Real defects are far above this ladder:
        # wrong grads/loss break step 1 at >1e-3; wrong weight-decay
        # coupling or bias correction breaks step 2 at >1e-2.
        for i, (j, t) in enumerate(zip(jax_losses, torch_losses)):
            rtol = (1e-6, 1e-5, 1e-3, 1e-2)[i]
            assert np.isclose(j, t, rtol=rtol, atol=1e-9), (i, j, t)
        # The curve must actually move (the optimizer is doing work).
        assert abs(torch_losses[-1] - torch_losses[0]) > 1e-3
    finally:
        jax.config.update("jax_enable_x64", False)
