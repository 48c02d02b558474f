"""Text-to-image retrieval over a precomputed gallery.

Functional twin of the reference inference path (reference:
inference.py:13-56): build an image-embedding gallery from a loader, encode
a text query, L2-normalize both sides, rank by dot product, ``topk(n*5)``
with stride-5 dedup (five captions per image). Rendering is decoupled — the
core returns filenames; a matplotlib grid helper is provided separately so
headless/TPU-pod runs never import a display stack.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mae_clip_tpu.ops.retrieval import retrieval_topk, strided_dedup


def _image_embed_fn(model):
    from mae_clip_tpu.data.images import normalize_uint8

    @jax.jit
    def embed(variables, images):
        images = normalize_uint8(images)
        feats = model.apply(variables, images, method=model.encode_image)
        return model.apply(variables, feats, method=model.project_image)

    return embed


def _text_embed_fn(model):
    @jax.jit
    def embed(variables, ids, mask):
        feats = model.apply(variables, ids, mask, method=model.encode_text)
        return model.apply(variables, feats, method=model.project_text)

    return embed


def compute_text_embeddings(model, variables, input_ids, attention_mask,
                            batch_size: int) -> np.ndarray:
    """Chunked encode+project of an (N, S) token table into (N, proj_dim)
    — the single text-side counterpart of ``compute_image_embeddings``
    (shared by the per-epoch eval hook, the standalone evaluator, and
    ``cli embed``)."""
    embed = _text_embed_fn(model)
    chunks: List[np.ndarray] = []
    for s in range(0, len(input_ids), batch_size):
        ids = jnp.asarray(input_ids[s:s + batch_size])
        mask = jnp.asarray(attention_mask[s:s + batch_size])
        chunks.append(np.asarray(embed(variables, ids, mask)))
    return np.concatenate(chunks)


def compute_image_embeddings(model, variables, loader: Iterable[Dict],
                             max_batches: Optional[int] = None
                             ) -> jax.Array:
    """Encode + project every image batch into one (N, proj_dim) gallery
    (reference: inference.py:21-27). ``max_batches`` stops early when the
    caller only needs a prefix (per-epoch eval subsample)."""
    embed = _image_embed_fn(model)
    chunks: List[np.ndarray] = []
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        emb = embed(variables, jnp.asarray(batch["image"]))
        valid = np.asarray(batch.get("valid",
                                     np.ones(emb.shape[0], dtype=bool)))
        chunks.append(np.asarray(emb)[valid])
    return jnp.asarray(np.concatenate(chunks, axis=0))


def compute_image_embeddings_from_store(model, variables, store, n: int,
                                        batch_size: int) -> jax.Array:
    """Gallery embeddings gathered from a device-resident store
    (data.device_store): zero image H2D traffic. The ragged tail is
    padded with index 0 (one static shape -> one executable) and dropped
    after the fetch."""
    embed = _image_embed_fn(model)
    chunks: List[np.ndarray] = []
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        count = len(idx)
        if count < batch_size:
            idx = np.concatenate(
                [idx, np.zeros((batch_size - count,), idx.dtype)])
        images = store.gather(jnp.asarray(idx.astype(np.int32)))["image"]
        chunks.append(np.asarray(embed(variables, images))[:count])
    return jnp.asarray(np.concatenate(chunks, axis=0))


def encode_text_query(model, variables, tokenizer, query: str,
                      max_length: Optional[int] = None) -> jax.Array:
    enc = tokenizer.encode_batch([query], max_length=max_length)
    ids = jnp.asarray(enc["input_ids"], jnp.int32)
    mask = jnp.asarray(enc["attention_mask"], jnp.int32)

    @jax.jit
    def embed(variables, ids, mask):
        feats = model.apply(variables, ids, mask, method=model.encode_text)
        return model.apply(variables, feats, method=model.project_text)

    return embed(variables, ids, mask)


def find_matches(model, variables, image_embeddings: jax.Array, query: str,
                 image_filenames: Sequence[str], tokenizer, n: int = 9,
                 dedup_stride: int = 5,
                 max_length: Optional[int] = None) -> List[str]:
    """Top-n image filenames for a text query (reference: inference.py:29-47).

    ``dedup_stride=5`` reproduces the reference's ``indices[::5]`` skip over
    the 5 duplicate captions per image in the COCO/Flickr galleries.
    """
    text_emb = encode_text_query(model, variables, tokenizer, query,
                                 max_length)
    _, indices = retrieval_topk(text_emb, image_embeddings,
                                k=n * dedup_stride)
    picked = strided_dedup(indices, n, dedup_stride)[0]
    return [image_filenames[int(i)] for i in np.asarray(picked)]


def show_matches(matches: Sequence[str], image_path: str = "") -> None:
    """Optional 3x3 grid rendering (reference: inference.py:49-56)."""
    import matplotlib.pyplot as plt
    from mae_clip_tpu.data.images import decode_image

    _, axes = plt.subplots(3, 3, figsize=(10, 10))
    for match, ax in zip(matches, axes.flatten()):
        path = f"{image_path}/{match}" if image_path else match
        ax.imshow(decode_image(path))
        ax.axis("off")
    plt.show()


def make_retrieval_eval_fn(model, dataset, make_loader_fn, batch_size: int,
                           ks: Sequence[int] = (1, 5, 10),
                           max_samples: Optional[int] = 1000,
                           store=None, text_features=None):
    """Build a ``Trainer.fit(eval_fn=...)`` hook computing retrieval
    recall@K on (a subsample of) a caption dataset each epoch.

    Uses the dataset's caption<->image pairing: text query i's ground truth
    is image i (one row per caption, images repeated — the reference's
    gallery layout, inference.py:46-47).

    ``text_features``: the LiT-style frozen-text feature cache
    (``precompute_text_features`` output, row-aligned with ``dataset``).
    When given, the per-epoch hook projects the cached 768-d features
    through the (trainable) text projection head instead of re-running
    the full frozen DistilBERT on the same captions every eval — the
    same cached branch the train step uses (models/clip.py
    ``text_features`` path; equivalence pinned in test_text_cache.py).
    """
    project = None
    if text_features is not None:
        @jax.jit
        def project(variables, feats):
            return model.apply(variables, feats, method=model.project_text)

    def eval_fn(trainer, epoch):
        del epoch
        # Same weights the valid loss / best-val selection / serving use:
        # the EMA tree when ema_eval is on, else the live params.
        from mae_clip_tpu.train.loop import _eval_variables
        variables = _eval_variables(trainer.state, trainer.cfg)
        n = len(dataset) if max_samples is None else min(len(dataset),
                                                         max_samples)
        if store is not None:
            image_emb = compute_image_embeddings_from_store(
                model, variables, store, n, batch_size)
        else:
            loader = make_loader_fn(dataset, batch_size)
            image_emb = compute_image_embeddings(
                model, variables, loader, max_batches=-(-n // batch_size))

        if project is not None:
            text_emb = project(variables,
                               jnp.asarray(text_features[:n]))
        else:
            text_emb = jnp.asarray(compute_text_embeddings(
                model, variables, dataset.input_ids[:n],
                dataset.attention_mask[:n], batch_size))
        # Ground truth by image FILENAME: the gallery has one row per
        # caption (images repeated 5x in COCO/Flickr), so any row of the
        # right image counts as a hit. K is clamped to the gallery size
        # (tiny validation splits).
        gallery_n = int(image_emb[:n].shape[0])
        kmax = min(max(ks), gallery_n)
        _, idx = retrieval_topk(text_emb, image_emb[:n], k=kmax)
        idx = np.asarray(idx)
        names = np.asarray(dataset.image_filenames[:n])
        out = {}
        for k in ks:
            kk = min(k, gallery_n)
            hits = (names[idx[:, :kk]] == names[:len(idx), None]).any(axis=1)
            out[f"eval/recall@{k}"] = float(hits.mean())
        return out

    return eval_fn


def evaluate_retrieval(model, variables, dataset, make_loader_fn,
                       batch_size: int, ks: Sequence[int] = (1, 5, 10),
                       max_samples: Optional[int] = None) -> Dict[str, float]:
    """Standalone bidirectional retrieval evaluation over a caption dataset.

    Returns text→image AND image→text recall@K (the reference only ships
    text→image, inference.py:29-47; i2t is the standard companion metric).
    Ground truth is filename-matched: the dataset has one row per caption
    with images repeated (reference gallery layout), so
    * t2i: a text query hits if any top-K gallery row is its own image
      (gallery deduped to unique images first);
    * i2t: a unique image hits if any top-K caption row names it.
    """
    n = len(dataset) if max_samples is None else min(len(dataset),
                                                     max_samples)
    loader = make_loader_fn(dataset, batch_size)
    row_img_emb = np.asarray(compute_image_embeddings(model, variables,
                                                      loader))[:n]

    text_emb = compute_text_embeddings(
        model, variables, dataset.input_ids[:n],
        dataset.attention_mask[:n], batch_size)

    names = np.asarray(dataset.image_filenames[:n])
    # Unique images, order-preserving (first caption row of each image).
    uniq_names, first_idx = np.unique(names, return_index=True)
    order = np.argsort(first_idx)
    uniq_names, first_idx = uniq_names[order], first_idx[order]
    uniq_emb = jnp.asarray(row_img_emb[first_idx])

    out: Dict[str, float] = {}
    kmax_t2i = min(max(ks), len(uniq_names))
    _, idx = retrieval_topk(jnp.asarray(text_emb), uniq_emb, k=kmax_t2i)
    idx = np.asarray(idx)
    for k in ks:
        kk = min(k, kmax_t2i)
        hits = (uniq_names[idx[:, :kk]] == names[:, None]).any(axis=1)
        out[f"t2i_recall@{k}"] = float(hits.mean())

    kmax_i2t = min(max(ks), n)
    _, idx = retrieval_topk(uniq_emb, jnp.asarray(text_emb), k=kmax_i2t)
    idx = np.asarray(idx)
    for k in ks:
        kk = min(k, kmax_i2t)
        hits = (names[idx[:, :kk]] == uniq_names[:, None]).any(axis=1)
        out[f"i2t_recall@{k}"] = float(hits.mean())
    out["num_captions"] = float(n)
    out["num_images"] = float(len(uniq_names))
    return out


def recall_at_k(text_embeddings: jax.Array, image_embeddings: jax.Array,
                text_to_image: np.ndarray, ks: Sequence[int] = (1, 5, 10)
                ) -> Dict[str, float]:
    """Retrieval recall@K: fraction of text queries whose ground-truth image
    ranks in the top K (the benchmark metric in BASELINE.json)."""
    kmax = max(ks)
    _, indices = retrieval_topk(text_embeddings, image_embeddings, k=kmax)
    indices = np.asarray(indices)
    gt = np.asarray(text_to_image)[:, None]
    out = {}
    for k in ks:
        hits = (indices[:, :k] == gt).any(axis=1)
        out[f"recall@{k}"] = float(hits.mean())
    return out
