"""Zero-shot classification via prompt embeddings.

Reproduces the reference's notebook protocol (reference: CIFAR.ipynb cells
5-10 and classifier.ipynb cells 4-8): build prompts "a photo of a {c}" for
each class, encode + project, L2-normalize both sides, score with
``softmax(100 * img_n @ txt_n.T)``, report top-k. Everything is batched and
jitted; class prompts are encoded once into a (C, D) classifier matrix.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mae_clip_tpu.ops.retrieval import l2_normalize


def build_zero_shot_classifier(model, variables, tokenizer,
                               class_names: Sequence[str],
                               template="a photo of a {}",
                               max_length: Optional[int] = None) -> jax.Array:
    """(C, proj_dim) matrix of L2-normalized class-prompt embeddings.

    ``template`` may be a single format string (the reference's protocol,
    CIFAR.ipynb cell 7) or a SEQUENCE of them — prompt ensembling per the
    CLIP paper (arXiv:2103.00020 §3.1.4): each template's class embedding
    is L2-normalized, averaged per class, and the mean re-normalized.
    """
    templates = ([template] if isinstance(template, str)
                 else list(template))
    if not templates:
        raise ValueError("need at least one template")
    prompts = [t.format(c) for c in class_names for t in templates]
    enc = tokenizer.encode_batch(prompts, max_length=max_length)
    ids = jnp.asarray(enc["input_ids"], jnp.int32)
    mask = jnp.asarray(enc["attention_mask"], jnp.int32)

    @jax.jit
    def embed(variables, ids, mask):
        feats = model.apply(variables, ids, mask, method=model.encode_text)
        proj = model.apply(variables, feats, method=model.project_text)
        per_prompt = l2_normalize(proj)            # (C*T, D)
        per_class = per_prompt.reshape(
            len(class_names), len(templates), -1).mean(axis=1)
        return l2_normalize(per_class)

    return embed(variables, ids, mask)


@jax.jit
def zero_shot_probs(image_embeddings: jax.Array,
                    classifier: jax.Array,
                    scale: float = 100.0) -> jax.Array:
    """softmax(scale * img_n @ class_n.T) — reference CIFAR.ipynb cell 9."""
    img_n = l2_normalize(image_embeddings.astype(jnp.float32))
    logits = scale * jnp.matmul(img_n, classifier.T.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def siglip_zero_shot_probs(image_embeddings: jax.Array,
                           classifier: jax.Array,
                           logit_scale: jax.Array,
                           logit_bias: jax.Array) -> jax.Array:
    """Per-class sigmoid probabilities for a SigLIP-trained model.

    SigLIP's inference protocol (arXiv:2303.15343 §4.2): each class is an
    independent binary prediction ``sigmoid(exp(s)·sim + b)`` using the
    TRAINED scale/bias — calibrated probabilities that need no softmax
    over the label set (and do not sum to 1). Rankings (and therefore
    top-k accuracy) are identical to :func:`zero_shot_probs` since
    sigmoid is monotone in the similarity.
    """
    img_n = l2_normalize(image_embeddings.astype(jnp.float32))
    sim = jnp.matmul(img_n, classifier.T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(jnp.exp(logit_scale) * sim + logit_bias)


def zero_shot_accuracy(model, variables, loader: Iterable[Dict],
                       classifier: jax.Array,
                       ks: Sequence[int] = (1, 5)) -> Dict[str, float]:
    """Top-k zero-shot accuracy over an (image, label) loader.

    Loader batches: {"image": (B,H,W,C), "label": (B,), optional "valid"}.
    """

    from mae_clip_tpu.data.images import normalize_uint8

    @jax.jit
    def embed(variables, images):
        images = normalize_uint8(images)
        feats = model.apply(variables, images, method=model.encode_image)
        return model.apply(variables, feats, method=model.project_image)

    # Clamp K to the number of classes (e.g. top-5 on a 4-class probe).
    n_classes = int(classifier.shape[0])
    kmax = min(max(ks), n_classes)
    hits = {k: 0 for k in ks}
    total = 0
    for batch in loader:
        emb = embed(variables, jnp.asarray(batch["image"]))
        probs = zero_shot_probs(emb, classifier)
        topk = np.asarray(jax.lax.top_k(probs, kmax)[1])
        labels = np.asarray(batch["label"])
        valid = np.asarray(batch.get("valid",
                                     np.ones(len(labels), dtype=bool)))
        for k in ks:
            kk = min(k, n_classes)
            hits[k] += int(((topk[:, :kk] == labels[:, None]).any(axis=1)
                            & valid).sum())
        total += int(valid.sum())
    return {f"top{k}_accuracy": hits[k] / max(total, 1) for k in ks}


CIFAR10_CLASSES = ["airplane", "automobile", "bird", "cat", "deer", "dog",
                   "frog", "horse", "ship", "truck"]


def load_cifar10_pickle(directory: str, split: str = "test"
                        ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Parse a standard ``cifar-10-batches-py/`` dump offline.

    The reference's CIFAR protocol consumes torchvision's ``CIFAR10``
    (reference: CIFAR.ipynb cell 6), which reads exactly this python-pickle
    format: each batch file holds ``data`` as (N, 3072) uint8 rows in
    CHW plane order (1024 R, 1024 G, 1024 B per 32x32 image) plus
    ``labels``; ``batches.meta`` carries ``label_names``.

    Returns (images uint8 (N, 32, 32, 3) RGB HWC, labels (N,) int64,
    class_names).
    """
    import os
    import pickle

    files = (["test_batch"] if split == "test"
             else [f"data_batch_{i}" for i in range(1, 6)])
    images, labels = [], []
    for fname in files:
        with open(os.path.join(directory, fname), "rb") as fh:
            d = pickle.load(fh, encoding="bytes")
        data = np.asarray(d[b"data"], np.uint8)
        images.append(data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        labels.extend(d[b"labels"])
    class_names = list(CIFAR10_CLASSES)
    meta_path = os.path.join(directory, "batches.meta")
    if os.path.exists(meta_path):
        with open(meta_path, "rb") as fh:
            meta = pickle.load(fh, encoding="bytes")
        class_names = [n.decode() if isinstance(n, bytes) else str(n)
                       for n in meta[b"label_names"]]
    return np.concatenate(images), np.asarray(labels, np.int64), class_names


def array_image_label_loader(images: np.ndarray, labels: Sequence[int],
                             size: int, batch_size: int
                             ) -> Iterable[Dict[str, np.ndarray]]:
    """Like :func:`image_label_loader` for in-memory uint8 HWC images
    (e.g. a CIFAR dump): reference-exact bilinear resize + normalize per
    image, static-shape batches, ragged tail padded + ``valid``-masked."""
    from mae_clip_tpu.data.images import host_preprocess

    n = len(images)
    for start in range(0, n, batch_size):
        chunk = images[start:start + batch_size]
        imgs = np.stack([host_preprocess(im, size) for im in chunk])
        lab = np.asarray(labels[start:start + batch_size])
        valid = np.ones(len(chunk), dtype=bool)
        if len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                                  imgs.dtype)])
            lab = np.concatenate([lab, np.zeros(pad, lab.dtype)])
            valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
        yield {"image": imgs, "label": lab, "valid": valid}


def zero_shot_cifar_eval(model, variables, tokenizer, cifar_dir: str,
                         size: int, batch_size: int = 64,
                         split: str = "test",
                         template: str = "a photo of a {}",
                         ks: Sequence[int] = (1, 5)) -> Dict[str, float]:
    """The reference CIFAR.ipynb protocol end-to-end over an offline
    ``cifar-10-batches-py/`` dump: "a photo of a {c}" prompts, L2-norm,
    softmax(100*sim), top-k accuracy."""
    images, labels, class_names = load_cifar10_pickle(cifar_dir, split)
    classifier = build_zero_shot_classifier(model, variables, tokenizer,
                                            class_names, template)
    loader = array_image_label_loader(images, labels, size, batch_size)
    out = zero_shot_accuracy(model, variables, loader, classifier, ks=ks)
    out["num_images"] = float(len(images))
    out["num_classes"] = float(len(class_names))
    return out


def class_dir_paths(directory: str
                    ) -> Tuple[List[str], List[int], List[str]]:
    """Walk a class-per-subdirectory image tree: (paths, labels, names)."""
    import os

    class_names = sorted(d for d in os.listdir(directory)
                         if os.path.isdir(os.path.join(directory, d)))
    if not class_names:
        raise ValueError(f"no class subdirectories under {directory}")
    paths, labels = [], []
    for li, cname in enumerate(class_names):
        cdir = os.path.join(directory, cname)
        for fname in sorted(os.listdir(cdir)):
            paths.append(os.path.join(cdir, fname))
            labels.append(li)
    return paths, labels, class_names


def image_label_loader(paths: Sequence[str], labels: Sequence[int],
                       size: int, batch_size: int
                       ) -> Iterable[Dict[str, np.ndarray]]:
    """Static-shape {image, label, valid} batches; ragged tail padded and
    ``valid``-masked (never dropped)."""
    from mae_clip_tpu.data.images import decode_image, host_preprocess

    for start in range(0, len(paths), batch_size):
        chunk = paths[start:start + batch_size]
        imgs = np.stack([host_preprocess(decode_image(p), size)
                         for p in chunk])
        lab = np.asarray(labels[start:start + batch_size])
        valid = np.ones(len(chunk), dtype=bool)
        if len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                                  imgs.dtype)])
            lab = np.concatenate([lab, np.zeros(pad, lab.dtype)])
            valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
        yield {"image": imgs, "label": lab, "valid": valid}


def zero_shot_dir_eval(model, variables, tokenizer, directory: str,
                       size: int, batch_size: int = 64,
                       template: str = "a photo of a {}",
                       ks: Sequence[int] = (1, 5)) -> Dict[str, float]:
    """Zero-shot accuracy over a class-per-subdirectory image tree
    (``directory/<class_name>/*.jpg``) — the CIFAR.ipynb protocol at
    dataset scale."""
    paths, labels, class_names = class_dir_paths(directory)
    classifier = build_zero_shot_classifier(model, variables, tokenizer,
                                            class_names, template)
    loader = image_label_loader(paths, labels, size, batch_size)
    out = zero_shot_accuracy(model, variables, loader, classifier, ks=ks)
    out["num_images"] = float(len(paths))
    out["num_classes"] = float(len(class_names))
    return out


def classify_one(model, variables, tokenizer, image_embedding: jax.Array,
                 labels: Sequence[str], template: str = "a photo of a {}",
                 top: int = 5) -> List[Tuple[str, float]]:
    """Free-form label probe for one image (reference classifier.ipynb)."""
    classifier = build_zero_shot_classifier(model, variables, tokenizer,
                                            labels, template)
    probs = np.asarray(zero_shot_probs(image_embedding[None], classifier))[0]
    order = np.argsort(-probs)[:top]
    return [(labels[i], float(probs[i])) for i in order]
