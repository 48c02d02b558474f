"""Fused retrieval: L2-normalize -> similarity matmul -> top-k, one jit.

The reference's retrieval path (reference: inference.py:42-47) normalizes
both sides, does ``text_n @ gallery_n.T``, then ``topk(n*5)`` with a
stride-5 dedup (five captions per image in the gallery). Here the whole
thing is one compiled function with the gallery scanned in chunks so
arbitrarily large galleries never materialize a full (Q, N) score matrix in
HBM: each chunk's scores are merged into a running top-k (monoid merge:
concat + top_k), which XLA keeps entirely on-device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1,
                 eps: float = 1e-12) -> jax.Array:
    """torch F.normalize(p=2) semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "normalize"))
def retrieval_topk(queries: jax.Array, gallery: jax.Array, k: int,
                   chunk_size: int = 8192, normalize: bool = True
                   ) -> Tuple[jax.Array, jax.Array]:
    """Top-k gallery indices per query by cosine/dot similarity.

    Args:
      queries: (Q, D) query embeddings (text side in the reference).
      gallery: (N, D) gallery embeddings (precomputed image side).
      k: number of neighbours.
      chunk_size: gallery rows scored per scan step (memory bound).
      normalize: L2-normalize both sides first (reference inference.py:42-43).

    Returns:
      (scores (Q, k), indices (Q, k)) sorted descending.
    """
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    if normalize:
        q = l2_normalize(q)
        g = l2_normalize(g)
    score = lambda chunk: jnp.matmul(q, chunk.T,
                                     preferred_element_type=jnp.float32)
    return _chunked_topk(q, (g,), g.shape[0], k, chunk_size, score)


def _chunked_topk(q: jax.Array, arrays: Tuple[jax.Array, ...], n: int,
                  k: int, chunk_size: int, score
                  ) -> Tuple[jax.Array, jax.Array]:
    """Shared running-top-k scan: ``arrays`` are (N, ...) gallery-side
    arrays chunked together; ``score(*chunks) -> (Q, chunk)`` produces each
    chunk's similarities. Padded rows score -inf; the carry merge is a
    monoid (concat + top_k) XLA keeps entirely on-device."""
    nq = q.shape[0]
    if n <= chunk_size:
        return jax.lax.top_k(score(*arrays), k)

    num_chunks = -(-n // chunk_size)
    pad = num_chunks * chunk_size - n
    chunked = tuple(
        jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)).reshape(
            (num_chunks, chunk_size) + a.shape[1:]) for a in arrays)
    base_ids = jnp.arange(chunk_size)

    def body(carry, inp):
        best_s, best_i = carry
        cidx, chunk = inp[0], inp[1:]
        s = score(*chunk)
        ids = base_ids[None, :] + cidx * chunk_size
        s = jnp.where(ids < n, s, -jnp.inf)
        cs = jnp.concatenate([best_s, s], axis=1)
        ci = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (nq, chunk_size))], axis=1)
        ts, ti_local = jax.lax.top_k(cs, k)
        return (ts, jnp.take_along_axis(ci, ti_local, axis=1)), None

    init = (jnp.full((nq, k), -jnp.inf, jnp.float32),
            jnp.zeros((nq, k), jnp.int32))
    (scores, indices), _ = jax.lax.scan(
        body, init, (jnp.arange(num_chunks),) + chunked)
    return scores, indices


@jax.jit
def quantize_embeddings(emb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization of (already L2-normalized)
    gallery embeddings: 4x less serving memory at rest.

    Returns (q (N, D) int8, scales (N,) f32) with dequant = q * scale;
    per-row amax maps to +-127, so worst-case per-component error is
    amax/254 (~0.2% of a unit row). The reference holds its gallery in
    f32 (inference.py:24-27); this is a serving-scale option it lacks.
    """
    x = emb.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def dequantize_embeddings(q: jax.Array, scales: jax.Array,
                          dtype=jnp.float32) -> jax.Array:
    return q.astype(dtype) * scales[:, None].astype(dtype)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def retrieval_topk_int8(queries: jax.Array, gallery_q: jax.Array,
                        scales: jax.Array, k: int,
                        chunk_size: int = 8192
                        ) -> Tuple[jax.Array, jax.Array]:
    """``retrieval_topk`` over an int8-quantized gallery: chunks are
    dequantized on the fly inside the scan, so only ``chunk_size`` f32
    rows ever exist at once — the gallery stays int8 at rest. Queries are
    L2-normalized; the gallery is assumed quantized FROM normalized rows
    (``quantize_embeddings``), so scores remain ~cosine."""
    q = l2_normalize(queries.astype(jnp.float32))

    def score(chunk_q, chunk_s):
        g = chunk_q.astype(jnp.float32) * chunk_s[:, None]
        return jnp.matmul(q, g.T, preferred_element_type=jnp.float32)

    return _chunked_topk(q, (gallery_q, scales), gallery_q.shape[0], k,
                         chunk_size, score)


def strided_dedup(indices: jax.Array, n: int, stride: int = 5) -> jax.Array:
    """The reference's duplicate-caption skip: take every ``stride``-th hit
    from the top n*stride (reference: inference.py:46-47 ``indices[::5]``)."""
    return indices[..., ::stride][..., :n]
