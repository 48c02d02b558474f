"""Multi-head attention: XLA reference path + Pallas flash-attention kernel.

The reference delegates attention to HF DistilBERT internals (reference:
modules.py:38,49-50) and would delegate ViT attention to timm (the
commented-out tower at modules.py:20-26). Here attention is a first-class op:

* ``attention_xla``: straightforward jnp implementation whose masking
  semantics bit-match HF DistilBERT at fp32 (scores where mask==0 are set to
  ``finfo.min`` before softmax, softmax in fp32).
* ``flash_attention``: Pallas TPU kernel with online softmax over key blocks
  (Dao et al. 2022 recipe adapted to the MXU/VMEM model). Forward runs as a
  single fused kernel; the backward pass recomputes attention via the XLA
  path under ``jax.vjp`` (flash recompute strategy) so gradients are exact.

Sequence lengths in this framework are short (<=256: 200-token captions,
197 ViT patches+CLS), so key blocks usually fit VMEM whole; the kernel still
tiles over query and key blocks so longer sequences (ring/blockwise sequence
parallelism later) slot in without interface changes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference attention. Shapes: q/k/v (B, H, S, Dh); key_valid (B, Sk).

    Matches HF DistilBERT masking: invalid-key scores are replaced with the
    dtype minimum (not added), then softmax'd in fp32. When
    ``dropout_rate > 0`` and a ``dropout_rng`` is given, inverted dropout is
    applied to the post-softmax attention probabilities — HF DistilBERT's
    train-mode ``attention_dropout`` placement (modeling_distilbert.py's
    ``MultiHeadSelfAttention``: ``weights = dropout(softmax(scores))``).
    """
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / jnp.sqrt(d).astype(q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if key_valid is not None:
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(key_valid[:, None, None, :], scores, neg)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

def _flash_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                      sm_scale: float, block_k: int, seq_k: int,
                      n_heads: int):
    """One (batch, q_block) program handles ALL heads of one batch element:
    fewer, fatter programs than a (batch*head,) grid — the k/v/mask loads
    and the online-softmax loop are shared across the (static, unrolled)
    head loop, which matters at this model family's short sequences.

    Matmuls run in the INPUT dtype (bf16 on TPU -> full-rate MXU) with fp32
    accumulation; the softmax state (m, l) and accumulator stay fp32.
    """
    num_kb = seq_k // block_k

    for h in range(n_heads):                              # static unroll
        q = q_ref[0, h]                                   # (block_q, d)
        block_q, d = q.shape

        m0 = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
        l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
        acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)

        def body(kb, carry):
            m_i, l_i, acc = carry
            kblk = k_ref[0, h, pl.ds(kb * block_k, block_k), :]
            vblk = v_ref[0, h, pl.ds(kb * block_k, block_k), :]
            mblk = mask_ref[0, 0, pl.ds(kb * block_k, block_k)]
            s = jax.lax.dot_general(
                q, kblk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(mblk[None, :] > 0, s, _MASK_VALUE)
            m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_i - m_new)
            l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(vblk.dtype), vblk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m_i, l_i, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
        o_ref[0, h] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                   key_valid: Optional[jax.Array], sm_scale: float,
                   block_q: int, block_k: int,
                   interpret: bool) -> jax.Array:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    # No head-dim padding: blocks span the full d, which Mosaic permits for
    # any size ("equal to the overall array dim"); padding 64 -> 128 would
    # waste half the MXU on ViT/DistilBERT head dims.
    d_p = d

    if key_valid is None:
        key_valid = jnp.ones((b, sk), dtype=jnp.float32)
    else:
        key_valid = key_valid.astype(jnp.float32)
    # Pad: invalid keys masked out; padded queries produce garbage rows that
    # are sliced away below.
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, d_p - d)))
    # Mask as (B, 1, Sk): Mosaic tiling requires the last two block dims be
    # (8k, 128k)-aligned or span the whole array.
    mp = jnp.pad(key_valid, ((0, 0), (0, sk_p - sk)))[:, None, :]

    grid = (b, sq_p // block_q)
    kernel = functools.partial(_flash_fwd_kernel, sm_scale=sm_scale,
                               block_k=block_k, seq_k=sk_p, n_heads=h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, block_q, d_p), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, sk_p, d_p), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, sk_p, d_p), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, block_q, d_p),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d_p), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, mp)
    return out[:, :, :sq, :d]


def _flash_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *,
                      sm_scale: float, n_heads: int):
    """Fused backward: one (batch,) program, heads unrolled, full sequence
    in VMEM (this model family's sequences are short; a k-blocked variant
    slots in for long-seq later). Standard flash-bwd math with softmax
    recomputation:

        P  = softmax(q k^T * scale)        (masked)
        dV = P^T dO
        dP = dO V^T
        dS = P * (dP - rowsum(P * dP))
        dQ = dS K * scale ;  dK = dS^T Q * scale
    """
    for h in range(n_heads):
        q = q_ref[0, h]
        kk = k_ref[0, h]
        vv = v_ref[0, h]
        do = do_ref[0, h].astype(jnp.float32)
        mrow = mask_ref[0, 0]

        s = jax.lax.dot_general(
            q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(mrow[None, :] > 0, s, _MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.maximum(l, 1e-30)                      # (Sq, Sk) fp32

        pt = p.astype(vv.dtype)
        dv = jax.lax.dot_general(
            pt, do.astype(vv.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Sk, d)
        dp = jax.lax.dot_general(
            do.astype(vv.dtype), vv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Sq, Sk)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, kk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, key_valid, g, sm_scale, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_p = _round_up(sq, 8)
    sk_p = _round_up(sk, 8)
    if key_valid is None:
        key_valid = jnp.ones((b, sk), dtype=jnp.float32)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    mp = jnp.pad(key_valid.astype(jnp.float32),
                 ((0, 0), (0, sk_p - sk)))[:, None, :]

    kernel = functools.partial(_flash_bwd_kernel, sm_scale=sm_scale,
                               n_heads=h)
    spec_q = pl.BlockSpec((1, h, sq_p, d), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, h, sk_p, d), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_q, spec_k, spec_k,
                  pl.BlockSpec((1, 1, sk_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, sk_p, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, sk_p, d), v.dtype)),
        interpret=interpret,
    )(qp, kp, vp, mp, gp)
    return dq[:, :, :sq, :], dk[:, :, :sk, :], dv[:, :, :sk, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(q, k, v, key_valid, sm_scale: float,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool = False):
    """Fused flash attention. q/k/v: (B, H, S, Dh); key_valid: (B, Sk) or None."""
    return _flash_forward(q, k, v, key_valid, sm_scale, block_q, block_k,
                          interpret)


def _flash_fwd_rule(q, k, v, key_valid, sm_scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, key_valid, sm_scale, block_q, block_k,
                         interpret)
    return out, (q, k, v, key_valid)


def _flash_bwd_rule(sm_scale, block_q, block_k, interpret, residuals, g):
    q, k, v, key_valid = residuals
    dq, dk, dv = _flash_backward(q, k, v, key_valid, g, sm_scale, interpret)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# qkv-packed single-shot attention (short sequences)
# ---------------------------------------------------------------------------
#
# The ViT blocks produce attention inputs as ONE fused qkv matmul of shape
# (B, S, 3*H*Dh) whose column order is the natural reshape (S, 3, H, Dh):
# column index = ((j*H + h)*Dh + d) for j in {q,k,v}. The XLA path must then
# reshape+transpose to (3, B, H, S, Dh) and transpose the context back —
# five HBM round-trips of data movement per block that profile as ~13% of
# the flagship train step (hlo_stats: vit.py qkv transposes + fp32 score
# layout copies). This kernel consumes the packed tensor DIRECTLY: per-head
# q/k/v are static 128-aligned column slices, the whole (short) sequence is
# resident in VMEM, softmax is single-shot (no online rescaling needed), and
# the context is written back in head-concatenated column order (B, S, H*Dh)
# — exactly the layout the output projection consumes. The backward kernel
# produces d_qkv in the SAME packed layout, so the fused qkv matmul's
# transpose consumes it without data movement either.

def _qkv_fwd_kernel(qkv_ref, mask_ref, o_ref, *, n_heads: int, head_dim: int,
                    sm_scale: float):
    h_count, d = n_heads, head_dim
    mrow = mask_ref[0, 0]                                   # (Sk,)
    for h in range(h_count):                                # static unroll
        q = qkv_ref[0, :, (0 * h_count + h) * d:(0 * h_count + h + 1) * d]
        k = qkv_ref[0, :, (1 * h_count + h) * d:(1 * h_count + h + 1) * d]
        v = qkv_ref[0, :, (2 * h_count + h) * d:(2 * h_count + h + 1) * d]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (Sq, Sk) fp32
        s = jnp.where(mrow[None, :] > 0, s, _MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / jnp.maximum(l, 1e-30)).astype(v.dtype)
        o_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _qkv_bwd_kernel(qkv_ref, mask_ref, do_ref, dqkv_ref, *, n_heads: int,
                    head_dim: int, sm_scale: float):
    """Recompute-softmax backward, d_qkv emitted in packed column layout."""
    h_count, d = n_heads, head_dim
    mrow = mask_ref[0, 0]
    for h in range(h_count):
        q = qkv_ref[0, :, (0 * h_count + h) * d:(0 * h_count + h + 1) * d]
        k = qkv_ref[0, :, (1 * h_count + h) * d:(1 * h_count + h + 1) * d]
        v = qkv_ref[0, :, (2 * h_count + h) * d:(2 * h_count + h + 1) * d]
        do = do_ref[0, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(mrow[None, :] > 0, s, _MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.maximum(l, 1e-30)                       # (Sq, Sk) fp32

        pt = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            pt, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (Sk, d)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (Sq, Sk)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dqkv_ref[0, :, (0 * h_count + h) * d:(0 * h_count + h + 1) * d] = (
            dq.astype(dqkv_ref.dtype))
        dqkv_ref[0, :, (1 * h_count + h) * d:(1 * h_count + h + 1) * d] = (
            dk.astype(dqkv_ref.dtype))
        dqkv_ref[0, :, (2 * h_count + h) * d:(2 * h_count + h + 1) * d] = (
            dv.astype(dqkv_ref.dtype))


def _qkv_pad(qkv, key_valid):
    """Pad sequence to a Mosaic-friendly multiple of 8; padded keys are
    masked out via key_valid (padded query rows are sliced away by callers)."""
    b, s, _ = qkv.shape
    s_p = _round_up(s, 8)
    if key_valid is None:
        key_valid = jnp.ones((b, s), dtype=jnp.float32)
    else:
        key_valid = key_valid.astype(jnp.float32)
    if s_p != s:
        qkv = jnp.pad(qkv, ((0, 0), (0, s_p - s), (0, 0)))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, s_p - s)))
    return qkv, key_valid[:, None, :], s_p


def _qkv_attention_forward(qkv, key_valid, n_heads, sm_scale, interpret):
    b, s, three_hd = qkv.shape
    d = three_hd // (3 * n_heads)
    qkv_p, mask_p, s_p = _qkv_pad(qkv, key_valid)
    kernel = functools.partial(_qkv_fwd_kernel, n_heads=n_heads, head_dim=d,
                               sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_p, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_p, n_heads * d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_p, n_heads * d), qkv.dtype),
        interpret=interpret,
    )(qkv_p, mask_p)
    return out[:, :s, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def qkv_packed_attention(qkv: jax.Array, key_valid: Optional[jax.Array],
                         n_heads: int, sm_scale: float,
                         interpret: bool = False) -> jax.Array:
    """Fused attention on a packed qkv tensor.

    Args:
      qkv: (B, S, 3*H*Dh) — fused qkv projection output, column order of
        ``reshape(B, S, 3, H, Dh)``.
      key_valid: optional (B, S) mask; 0 = masked key.
    Returns:
      (B, S, H*Dh) context, head-concatenated (the output-projection layout).
    """
    return _qkv_attention_forward(qkv, key_valid, n_heads, sm_scale,
                                  interpret)


def _qkv_attn_fwd_rule(qkv, key_valid, n_heads, sm_scale, interpret):
    out = _qkv_attention_forward(qkv, key_valid, n_heads, sm_scale, interpret)
    return out, (qkv, key_valid)


def _qkv_attn_bwd_rule(n_heads, sm_scale, interpret, residuals, g):
    qkv, key_valid = residuals
    b, s, three_hd = qkv.shape
    d = three_hd // (3 * n_heads)
    qkv_p, mask_p, s_p = _qkv_pad(qkv, key_valid)
    g_p = jnp.pad(g, ((0, 0), (0, s_p - s), (0, 0))) if s_p != s else g
    kernel = functools.partial(_qkv_bwd_kernel, n_heads=n_heads, head_dim=d,
                               sm_scale=sm_scale)
    dqkv = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_p, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_p, n_heads * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_p, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_p, three_hd), qkv.dtype),
        interpret=interpret,
    )(qkv_p, mask_p, g_p)
    return dqkv[:, :s, :], None


qkv_packed_attention.defvjp(_qkv_attn_fwd_rule, _qkv_attn_bwd_rule)


def fused_qkv_attention(qkv: jax.Array, n_heads: int,
                        key_valid: Optional[jax.Array] = None,
                        sm_scale: Optional[float] = None,
                        impl: str = "xla",
                        interpret: bool = False) -> jax.Array:
    """Attention over a packed (B, S, 3*H*Dh) qkv tensor.

    ``impl='pallas_qkv'`` runs :func:`qkv_packed_attention` (no layout
    changes at all). Other impls unpack to (B, H, S, Dh) and dispatch to
    :func:`multi_head_attention`, reproducing the canonical XLA math
    bit-for-bit (the parity-bound path).
    """
    b, s, three_hd = qkv.shape
    d = three_hd // (3 * n_heads)
    scale = float(sm_scale) if sm_scale is not None else float(1.0 / d ** 0.5)
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # Measured IN-MODEL on v5e (b256 flagship train step, fwd+bwd+AdamW):
        # MAE decoder (S=197, H=2, Dh=128): packed kernel 45.8 vs XLA 47.7
        # ms/step — the XLA path's five layout changes + fp32 score copies
        # dominate at full sequence length. ViT encoder visible pass (S=51,
        # H=3): XLA wins by ~4 ms/step — at tiny sequences XLA fuses the
        # layout changes into adjacent matmuls and the kernel's per-program
        # work is too small. Policy: packed kernel for longer sequences
        # only; whole-sequence-in-VMEM design caps it at 1024.
        impl = "pallas_qkv" if (on_tpu and 128 <= s <= 1024) else "xla"
    if impl == "pallas_qkv":
        return qkv_packed_attention(qkv, key_valid, n_heads, scale, interpret)
    x = qkv.reshape(b, s, 3, n_heads, d).transpose(2, 0, 3, 1, 4)
    ctx = multi_head_attention(x[0], x[1], x[2], key_valid=key_valid,
                               sm_scale=scale, impl=impl, interpret=interpret)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, n_heads * d)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    impl: str = "xla",
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch between the XLA and Pallas implementations.

    ``impl='auto'``: measured on v5e (b=8, h=12, d=64, bf16): XLA's fused
    attention wins at this model family's short sequences (<=64-200
    tokens, dispatch/fusion bound); the flash kernel wins at seq
    256-1024 (score matrix stops fitting fusion-friendly sizes); beyond
    ~2048 the current whole-sequence-per-program kernel exceeds VMEM
    comfort and XLA wins again (a k-blocked HBM-DMA variant is the
    future fix). Policy: pallas iff 256 <= seq_k <= 1024 on TPU.

    Attention-probability dropout (``dropout_rate > 0`` with a rng) forces
    the XLA path: the Pallas kernels never materialize the probability
    matrix, and train-mode dropout only arises in the HF-parity text tower
    whose short sequences resolve to XLA anyway.
    """
    d = q.shape[-1]
    scale = float(sm_scale) if sm_scale is not None else float(1.0 / d ** 0.5)
    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if impl in ("auto", "pallas_qkv") or use_dropout:
        # "pallas_qkv" needs the packed (B, S, 3*H*Dh) layout; callers with
        # separate q/k/v (the HF-structured text tower) resolve it like auto.
        import jax as _jax
        on_tpu = _jax.default_backend() == "tpu"
        impl = ("pallas" if (on_tpu and 256 <= k.shape[2] <= 1024
                             and not use_dropout)
                else "xla")
    if impl == "xla":
        return attention_xla(q, k, v, key_valid, scale,
                             dropout_rate=dropout_rate,
                             dropout_rng=dropout_rng)
    if impl == "pallas":
        kv = None if key_valid is None else key_valid
        return flash_attention(q, k, v, kv, scale, 128, 128, interpret)
    raise ValueError(f"unknown attention impl {impl!r}")
