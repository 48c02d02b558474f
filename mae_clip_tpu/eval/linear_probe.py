"""Linear-probe evaluation of frozen image features.

The MAE paper's standard encoder-quality protocol (arXiv:2111.06377 §4.3,
"linear probing"): freeze the encoder, train a linear classifier on pooled
features, report top-k accuracy. The reference repo has no counterpart
(its only evals are retrieval and zero-shot prompts); this completes the
MAE capability set alongside ``train.loop.make_mae_pretrain_step``.

TPU-native shape: feature extraction is one jitted batched pass; the probe
itself is full-batch multinomial logistic regression trained inside a
single jitted ``lax.fori_loop`` (features for probe-scale datasets fit in
HBM comfortably: N x D fp32), so the whole fit is one device program — no
per-step host round trips.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fit_linear_probe(train_feats: jax.Array, train_labels: jax.Array,
                     num_classes: int, steps: int = 500, lr: float = 1e-2,
                     weight_decay: float = 1e-4
                     ) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Full-batch Adam on softmax cross-entropy over frozen features.

    Features are standardized with train-set mean/std (the jitted stats are
    returned so eval uses the same affine transform — the MAE paper uses a
    BatchNorm head for the same reason). Returns (W, b, norm_stats).
    """
    x = train_feats.astype(jnp.float32)
    y = train_labels.astype(jnp.int32)
    mean = jnp.mean(x, axis=0)
    std = jnp.std(x, axis=0) + 1e-6
    xn = (x - mean) / std
    d = x.shape[-1]

    def loss_fn(wb):
        w, b = wb
        logits = xn @ w + b
        ce = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                                  y[:, None], axis=1).mean()
        return ce + weight_decay * jnp.sum(w * w)

    import optax
    tx = optax.adam(lr)
    w0 = jnp.zeros((d, num_classes), jnp.float32)
    b0 = jnp.zeros((num_classes,), jnp.float32)

    @jax.jit
    def fit(wb):
        opt_state = tx.init(wb)

        def body(_, carry):
            wb, opt_state = carry
            grads = jax.grad(loss_fn)(wb)
            updates, opt_state = tx.update(grads, opt_state, wb)
            return optax.apply_updates(wb, updates), opt_state

        wb, _ = jax.lax.fori_loop(0, steps, body, (wb, opt_state))
        return wb

    w, b = fit((w0, b0))
    return w, b, {"mean": mean, "std": std}


def probe_accuracy(w: jax.Array, b: jax.Array, norm_stats: Dict,
                   feats: jax.Array, labels: np.ndarray,
                   ks: Sequence[int] = (1, 5)) -> Dict[str, float]:
    xn = (feats.astype(jnp.float32) - norm_stats["mean"]) / norm_stats["std"]
    logits = np.asarray(xn @ w + b)
    n_classes = logits.shape[-1]
    order = np.argsort(-logits, axis=-1)
    labels = np.asarray(labels)
    out = {}
    for k in ks:
        kk = min(k, n_classes)
        out[f"top{k}_accuracy"] = float(
            (order[:, :kk] == labels[:, None]).any(axis=1).mean())
    return out


def extract_features(embed_fn: Callable, loader) -> Tuple[np.ndarray,
                                                          np.ndarray]:
    """Run a jitted embed fn over {image, label, valid} batches; returns
    the valid rows' (features, labels)."""
    feats, labels = [], []
    for batch in loader:
        f = np.asarray(embed_fn(jnp.asarray(batch["image"])))
        valid = np.asarray(batch.get("valid",
                                     np.ones(len(f), dtype=bool)))
        feats.append(f[valid])
        labels.append(np.asarray(batch["label"])[valid])
    return np.concatenate(feats), np.concatenate(labels)


def linear_probe_dir_eval(model, variables, directory: str, size: int,
                          batch_size: int = 64, val_fraction: float = 0.2,
                          seed: int = 0, steps: int = 500, lr: float = 1e-2,
                          weight_decay: float = 1e-4,
                          ks: Sequence[int] = (1, 5),
                          encode_fn: Optional[Callable] = None
                          ) -> Dict[str, float]:
    """Linear probe over a class-per-subdirectory image tree.

    Probes the PRE-projection pooled image features (``encode_image``) —
    the tower output the MAE protocol evaluates — not the contrastive
    projection. ``encode_fn(variables, images)`` overrides the feature
    extractor (e.g. a standalone ``MAEViT.encode_full``).
    """
    from mae_clip_tpu.eval.zeroshot import class_dir_paths, image_label_loader

    paths, labels, class_names = class_dir_paths(directory)
    n = len(paths)
    order = np.random.default_rng(seed).permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, train_idx = order[:n_val], order[n_val:]
    if len(train_idx) == 0:
        raise ValueError("val_fraction leaves no training images")

    if encode_fn is None:
        def encode_fn(variables, images):
            return model.apply(variables, images, method=model.encode_image)

    @jax.jit
    def embed(images):
        return encode_fn(variables, images)

    def split_loader(idx):
        return image_label_loader([paths[i] for i in idx],
                                  [labels[i] for i in idx], size, batch_size)

    train_f, train_y = extract_features(embed, split_loader(train_idx))
    val_f, val_y = extract_features(embed, split_loader(val_idx))

    w, b, stats = fit_linear_probe(jnp.asarray(train_f),
                                   jnp.asarray(train_y),
                                   num_classes=len(class_names),
                                   steps=steps, lr=lr,
                                   weight_decay=weight_decay)
    out = {f"probe_{k}": v for k, v in
           probe_accuracy(w, b, stats, jnp.asarray(val_f), val_y,
                          ks=ks).items()}
    out["probe_train_top1"] = probe_accuracy(
        w, b, stats, jnp.asarray(train_f), train_y, ks=(1,))["top1_accuracy"]
    out["num_train"] = float(len(train_y))
    out["num_val"] = float(len(val_y))
    out["num_classes"] = float(len(class_names))
    return out
