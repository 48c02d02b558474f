"""Fused transformer block-stack Pallas kernel (forward + backward).

Motivation (BASELINE.md end-of-round-1 trace): at b256 the flagship step's
remaining gap to the FLOP floor is spread across dozens of 0.05-0.2 ms XLA
fusions — per-layer LN stacks, qkv/proj/MLP matmul groups and their
backward twins each round-trip HBM. This kernel runs a whole stack of
pre-LN transformer blocks (the ViT encoder's self-attention blocks and the
CrossMAE decoder's cross-attention blocks share one layout) with each
block's weights resident in VMEM while the batch streams through it:

* grid = (L, B/G), block index outer, batch inner: weights (and, in the
  backward, the fp32 weight-gradient accumulators) for block ``l`` are
  DMA'd once and reused across the whole batch sweep;
* the activation stream is carried between grid steps through an
  input/output-aliased HBM buffer (one (G, Sq, D) tile in flight) — the
  write of step (l, g) is consumed by step (l+1, g), a full batch sweep
  later, so the one-step DMA lookahead never races it;
* forward emits each block's input (the per-block residual stream) so the
  backward recomputes only intra-block intermediates — the standard
  remat-per-block tradeoff, with the recompute staying in VMEM;
* backward accumulates weight grads in fp32 VMEM across the batch sweep
  (initialized at the first batch tile) and writes them once per block;
  dq is carried backward through the same aliasing scheme and the
  cross-attention kv gradient accumulates across blocks.

Both block flavors are pre-LN (LN -> attention -> +res -> LN -> MLP ->
+res), deterministic (dropout 0 — the fused path serves the from-scratch
flagship recipe whose towers run dropout-free), with fp32 LN statistics
and fp32 softmax. head_dim must be a multiple of 128 (the MXU lane width;
the flagship geometry — image_heads=3 at D=384, decoder_heads=2 at D=256 —
satisfies this; canonical timm/HF geometries keep the XLA path).

Reference semantics being fused: models/vit.py::ViTBlock (self-attention)
and models/mae.py::CrossAttnBlock (CrossMAE decoder, arXiv:2401.14391).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LN_EPS = 1e-6
# tanh-GELU constants (jax.nn.gelu approximate=True)
_GELU_C = 0.7978845608028654        # sqrt(2/pi)
_GELU_A = 0.044715

_W_KEYS = ("ln1_g", "ln1_b", "lnkv_g", "lnkv_b", "wq", "bq", "wkv", "bkv",
           "wproj", "bproj", "ln2_g", "ln2_b", "wfc1", "bfc1", "wfc2",
           "bfc2")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# In-kernel math helpers
# ---------------------------------------------------------------------------

def _layernorm_fwd(x, g, b):
    """fp32-stat LayerNorm. Returns (y, xhat, rstd) for backward reuse."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * rstd
    y = xhat * g.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype), xhat, rstd


def _layernorm_bwd(dy, xhat, rstd, g):
    """Input cotangent of LayerNorm (dy fp32 -> fp32).

    dx = rstd * (dyg - mean(dyg) - xhat * mean(dyg * xhat)),  dyg = dy*g
    """
    dyg = dy * g.astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    return rstd * (dyg - m1 - xhat * m2)


def _gelu_fwd(x, kind: str):
    xf = x.astype(jnp.float32)
    if kind == "tanh":
        t = jnp.tanh(_GELU_C * (xf + _GELU_A * xf ** 3))
        return (0.5 * xf * (1.0 + t)).astype(x.dtype)
    sqrt2 = 1.4142135623730951
    return (0.5 * xf * (1.0 + jax.lax.erf(xf / sqrt2))).astype(x.dtype)


def _gelu_grad(x, kind: str):
    """d gelu / dx at x (fp32)."""
    xf = x.astype(jnp.float32)
    if kind == "tanh":
        inner = _GELU_C * (xf + _GELU_A * xf ** 3)
        t = jnp.tanh(inner)
        dinner = _GELU_C * (1.0 + 3.0 * _GELU_A * xf * xf)
        return 0.5 * (1.0 + t) + 0.5 * xf * (1.0 - t * t) * dinner
    sqrt2 = 1.4142135623730951
    inv_sqrt_2pi = 0.3989422804014327
    cdf = 0.5 * (1.0 + jax.lax.erf(xf / sqrt2))
    pdf = jnp.exp(-0.5 * xf * xf) * inv_sqrt_2pi
    return cdf + xf * pdf


def _mm(a, b):
    """a @ b on the MXU with fp32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a @ b.T with fp32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _t_mm(a, b):
    """a.T @ b with fp32 accumulation."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attention(qp, kvp, *, n_heads, head_dim, block_g, sq_p, sk_p, sk,
               dtype, keep_probs=False):
    """Per-sample multi-head attention on packed projections.

    qp: (G*Sq_p, H*dh); kvp: (G*Sk_p, 2*H*dh), k-then-v head-major.
    Returns ctx (G*Sq_p, H*dh) dtype, and probs list [(Sq_p, Sk_p) fp32]
    in (g, h) order when keep_probs.
    """
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, sk_p), 1)
    kmask = kiota < sk
    scale = 1.0 / float(head_dim) ** 0.5
    rows = []
    probs = []
    for g in range(block_g):
        qrows = qp[g * sq_p:(g + 1) * sq_p]
        krows = kvp[g * sk_p:(g + 1) * sk_p]
        heads = []
        for hh in range(n_heads):
            qh = qrows[:, hh * head_dim:(hh + 1) * head_dim]
            kh = krows[:, hh * head_dim:(hh + 1) * head_dim]
            vh = krows[:, (n_heads + hh) * head_dim:
                       (n_heads + hh + 1) * head_dim]
            s = _mm_t(qh, kh) * scale
            s = jnp.where(kmask, s, _MASK_VALUE)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            if keep_probs:
                probs.append(p)
            heads.append(_mm(p.astype(dtype), vh).astype(dtype))
        rows.append(jnp.concatenate(heads, axis=1))
    return jnp.concatenate(rows, axis=0), probs


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _stack_fwd_kernel(kv_ref, ln1g, ln1b, lnkvg, lnkvb, wq, bq, wkv, bkv,
                      wproj, bproj, ln2g, ln2b, wfc1, bfc1, wfc2, bfc2,
                      xin_ref, xout_ref, qstack_ref, *, cross, n_heads,
                      head_dim, gelu, sk, block_g, sq_p, sk_p):
    x3 = xin_ref[0]                               # (G, Sq_p, D)
    g_, s_, d_ = x3.shape
    dtype = x3.dtype
    x = x3.reshape(g_ * s_, d_)
    qstack_ref[0, 0] = x3                         # this block's input

    h, _, _ = _layernorm_fwd(x, ln1g[0], ln1b[0])
    if cross:
        kv = kv_ref[0].reshape(-1, d_)
        kvh, _, _ = _layernorm_fwd(kv, lnkvg[0], lnkvb[0])
    else:
        kvh = h
    qp = (_mm(h, wq[0]) + bq[0].astype(jnp.float32)).astype(dtype)
    kvp = (_mm(kvh, wkv[0]) + bkv[0].astype(jnp.float32)).astype(dtype)

    ctx, _ = _attention(qp, kvp, n_heads=n_heads, head_dim=head_dim,
                        block_g=g_, sq_p=sq_p, sk_p=sk_p, sk=sk,
                        dtype=dtype)
    x1 = x + (_mm(ctx, wproj[0])
              + bproj[0].astype(jnp.float32)).astype(dtype)
    h2, _, _ = _layernorm_fwd(x1, ln2g[0], ln2b[0])
    a1 = (_mm(h2, wfc1[0]) + bfc1[0].astype(jnp.float32)).astype(dtype)
    a2 = _gelu_fwd(a1, gelu)
    mlp = (_mm(a2, wfc2[0]) + bfc2[0].astype(jnp.float32)).astype(dtype)
    xout_ref[0] = (x1 + mlp).reshape(g_, s_, d_)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _stack_bwd_kernel(kv_ref, qin_ref, ln1g, ln1b, lnkvg, lnkvb, wq, bq,
                      wkv, bkv, wproj, bproj, ln2g, ln2b, wfc1, bfc1, wfc2,
                      bfc2, dqin_ref, dqout_ref, dkv_ref, dln1g, dln1b,
                      dlnkvg, dlnkvb, dwq, dbq, dwkv, dbkv, dwproj, dbproj,
                      dln2g, dln2b, dwfc1, dbfc1, dwfc2, dbfc2, *, cross,
                      n_heads, head_dim, gelu, sk, block_g, sq_p, sk_p):
    li = pl.program_id(0)
    gi = pl.program_id(1)

    x3 = qin_ref[0, 0]
    g_, s_, d_ = x3.shape
    dtype = x3.dtype
    x = x3.reshape(g_ * s_, d_)
    dqo = dqin_ref[0].reshape(g_ * s_, d_).astype(jnp.float32)

    # ---- recompute forward intermediates for this block ----
    h, xhat1, rstd1 = _layernorm_fwd(x, ln1g[0], ln1b[0])
    if cross:
        kv = kv_ref[0].reshape(-1, d_)
        kvh, xhatkv, rstdkv = _layernorm_fwd(kv, lnkvg[0], lnkvb[0])
    else:
        kvh = h
    qp = (_mm(h, wq[0]) + bq[0].astype(jnp.float32)).astype(dtype)
    kvp = (_mm(kvh, wkv[0]) + bkv[0].astype(jnp.float32)).astype(dtype)
    ctx, probs = _attention(qp, kvp, n_heads=n_heads, head_dim=head_dim,
                            block_g=g_, sq_p=sq_p, sk_p=sk_p, sk=sk,
                            dtype=dtype, keep_probs=True)
    x1 = x + (_mm(ctx, wproj[0])
              + bproj[0].astype(jnp.float32)).astype(dtype)
    h2, xhat2, rstd2 = _layernorm_fwd(x1, ln2g[0], ln2b[0])
    a1 = (_mm(h2, wfc1[0]) + bfc1[0].astype(jnp.float32)).astype(dtype)
    a2 = _gelu_fwd(a1, gelu)

    # ---- backward through the MLP half ----
    da2 = _mm_t(dqo.astype(dtype), wfc2[0])                   # (GS, F) f32
    da1 = da2 * _gelu_grad(a1, gelu)
    dh2 = _mm_t(da1.astype(dtype), wfc1[0])                   # (GS, D) f32
    dx1 = dqo + _layernorm_bwd(dh2, xhat2, rstd2, ln2g[0])

    # ---- backward through the attention half ----
    dctx = _mm_t(dx1.astype(dtype), wproj[0])                 # (GS, D) f32
    scale = 1.0 / float(head_dim) ** 0.5
    dqp_rows = []
    dkvp_rows = []
    pi = 0
    for g in range(g_):
        qrows = qp[g * sq_p:(g + 1) * sq_p]
        krows = kvp[g * sk_p:(g + 1) * sk_p]
        dq_heads = []
        dk_heads = []
        dv_heads = []
        for hh in range(n_heads):
            p = probs[pi]
            pi += 1
            qh = qrows[:, hh * head_dim:(hh + 1) * head_dim]
            kh = krows[:, hh * head_dim:(hh + 1) * head_dim]
            vh = krows[:, (n_heads + hh) * head_dim:
                       (n_heads + hh + 1) * head_dim]
            dch = dctx[g * sq_p:(g + 1) * sq_p,
                       hh * head_dim:(hh + 1) * head_dim].astype(dtype)
            pt = p.astype(dtype)
            dv_heads.append(_t_mm(pt, dch))                   # (Sk, dh) f32
            dp = _mm_t(dch, vh)                               # (Sq, Sk) f32
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta)).astype(dtype)
            dq_heads.append(_mm(ds, kh) * scale)              # (Sq, dh) f32
            dk_heads.append(_t_mm(ds, qh) * scale)            # (Sk, dh) f32
        dqp_rows.append(jnp.concatenate(dq_heads, axis=1))
        dkvp_rows.append(jnp.concatenate(dk_heads + dv_heads, axis=1))
    dqp = jnp.concatenate(dqp_rows, axis=0)                   # (GSq, D) f32
    dkvp = jnp.concatenate(dkvp_rows, axis=0)                 # (GSk, 2D) f32

    dh = _mm_t(dqp.astype(dtype), wq[0])                      # (GSq, D) f32
    dkvh = _mm_t(dkvp.astype(dtype), wkv[0])                  # (GSk, D) f32
    if cross:
        dkv_rows = _layernorm_bwd(dkvh, xhatkv, rstdkv, lnkvg[0])
        dkv_block = dkv_rows.reshape(kv_ref[0].shape)

        # dkv accumulates over blocks; the first processed grid row
        # (li == 0, i.e. layer L-1) initializes each batch tile.
        @pl.when(li == 0)
        def _():
            dkv_ref[0] = dkv_block.astype(dkv_ref.dtype)

        @pl.when(li != 0)
        def _():
            dkv_ref[0] = (dkv_ref[0].astype(jnp.float32)
                          + dkv_block).astype(dkv_ref.dtype)
    else:
        dh = dh + dkvh
    dx = dx1 + _layernorm_bwd(dh, xhat1, rstd1, ln1g[0])
    dqout_ref[0] = dx.reshape(g_, s_, d_).astype(dqout_ref.dtype)

    # ---- weight gradients (fp32 accumulation across the batch sweep) ----
    updates = (
        (dln1g, jnp.sum(dh * xhat1, axis=0, keepdims=True)),
        (dln1b, jnp.sum(dh, axis=0, keepdims=True)),
        (dwq, _t_mm(h, dqp.astype(dtype))),
        (dbq, jnp.sum(dqp, axis=0, keepdims=True)),
        (dwkv, _t_mm(kvh, dkvp.astype(dtype))),
        (dbkv, jnp.sum(dkvp, axis=0, keepdims=True)),
        (dwproj, _t_mm(ctx, dx1.astype(dtype))),
        (dbproj, jnp.sum(dx1, axis=0, keepdims=True)),
        (dln2g, jnp.sum(dh2 * xhat2, axis=0, keepdims=True)),
        (dln2b, jnp.sum(dh2, axis=0, keepdims=True)),
        (dwfc1, _t_mm(h2, da1.astype(dtype))),
        (dbfc1, jnp.sum(da1, axis=0, keepdims=True)),
        (dwfc2, _t_mm(a2, dqo.astype(dtype))),
        (dbfc2, jnp.sum(dqo, axis=0, keepdims=True)),
    )
    if cross:
        updates = updates + (
            (dlnkvg, jnp.sum(dkvh * xhatkv, axis=0, keepdims=True)),
            (dlnkvb, jnp.sum(dkvh, axis=0, keepdims=True)),
        )
    else:
        zero_d = jnp.zeros((1, d_), jnp.float32)
        updates = updates + ((dlnkvg, zero_d), (dlnkvb, zero_d))

    @pl.when(gi == 0)
    def _():
        for ref, val in updates:
            ref[0] = val.astype(ref.dtype)

    @pl.when(gi != 0)
    def _():
        for ref, val in updates:
            ref[0] = ref[0] + val.astype(ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _pick_block_g(batch: int, sq_p: int) -> int:
    """Batch elements per program: target >=256 activation rows per matmul
    (two full MXU row tiles) without exploding VMEM."""
    target = max(1, 256 // sq_p)
    for cand in (8, 4, 2):
        if cand <= target and batch % cand == 0:
            return cand
    return 1


def _bwd_block_g(block_g: int, d: int, f: int) -> int:
    """Backward batch tile: the bwd kernel holds one block's bf16 weights
    PLUS their fp32 grad accumulators in VMEM (3x the fwd's weight
    footprint), so its activation budget is tighter. Halve the fwd tile
    whenever the weight+grad footprint is large (measured: the ViT-S
    encoder bwd at the fwd tile needs 19MB scoped VMEM vs the 16MB
    default limit)."""
    weight_params = 2 * d * d + d * 2 * d + 2 * d * f
    weight_bytes = weight_params * (2 + 4)            # bf16 W + f32 dW
    if weight_bytes > 8 * 1024 * 1024 and block_g > 1:
        return block_g // 2
    return block_g


def _pad_tokens(x, s_p):
    b, s, d = x.shape
    if s_p == s:
        return x
    return jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))


def _block_index(nd: int, reverse_from: int = 0):
    """index_map selecting stacked-weight block l (optionally reversed)."""
    if reverse_from:
        return functools.partial(
            lambda l, g, _nd: (reverse_from - 1 - l,) + (0,) * (_nd - 1),
            _nd=nd)
    return functools.partial(lambda l, g, _nd: (l,) + (0,) * (_nd - 1),
                             _nd=nd)


def _weight_specs(w: Dict[str, jax.Array], reverse_from: int = 0):
    return [pl.BlockSpec((1,) + w[k].shape[1:],
                         _block_index(w[k].ndim, reverse_from),
                         memory_space=pltpu.VMEM)
            for k in _W_KEYS]


def _vec3(w: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Reshape per-block vector weights (L, X) -> (L, 1, X): Mosaic
    requires the last two block dims be (8, 128)-divisible or span the
    whole array dim; the inserted singleton spans, and (1, X) broadcasts
    exactly like (X,) inside the kernel."""
    return {k: (v[:, None, :] if v.ndim == 2 else v) for k, v in w.items()}


def _slice_w(w: Dict[str, jax.Array], l: int) -> Dict[str, jax.Array]:
    return {k: v[l:l + 1] for k, v in w.items()}


def _stack_forward(q0, kv, w, n_heads, gelu, cross, interpret):
    if interpret and w["wq"].shape[0] > 1:
        # Interpret mode (CPU tests) does not honor input_output_aliases,
        # so the cross-grid-step activation carry never propagates there.
        # Run the SAME kernel one block per pallas_call, chained in XLA —
        # semantically identical; the multi-block carry is validated on
        # real TPU hardware.
        x = q0
        stacks = []
        for l in range(w["wq"].shape[0]):
            x, qs = _stack_forward(x, kv, _slice_w(w, l), n_heads, gelu,
                                   cross, interpret)
            stacks.append(qs)
        return x, jnp.concatenate(stacks, axis=0)

    b, sq, d = q0.shape
    sk = kv.shape[1] if cross else sq
    n_blocks = w["wq"].shape[0]
    head_dim = d // n_heads
    sq_p = _round_up(sq, 16)
    sk_p = _round_up(sk, 16) if cross else sq_p
    block_g = _pick_block_g(b, sq_p)
    nb = b // block_g

    q0p = _pad_tokens(q0, sq_p).reshape(nb, block_g, sq_p, d)
    kvp = (_pad_tokens(kv, sk_p).reshape(nb, block_g, sk_p, d)
           if cross else q0p)

    kernel = functools.partial(
        _stack_fwd_kernel, cross=cross, n_heads=n_heads, head_dim=head_dim,
        gelu=gelu, sk=sk, block_g=block_g, sq_p=sq_p, sk_p=sk_p)

    kv_spec = pl.BlockSpec((1, block_g, sk_p, d), lambda l, g: (g, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((1, block_g, sq_p, d),
                              lambda l, g: (g, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    qstack_spec = pl.BlockSpec((1, 1, block_g, sq_p, d),
                               lambda l, g: (l, g, 0, 0, 0),
                               memory_space=pltpu.VMEM)

    w3 = _vec3(w)
    out, qstack = pl.pallas_call(
        kernel,
        grid=(n_blocks, nb),
        in_specs=[kv_spec] + _weight_specs(w3) + [carry_spec],
        out_specs=(carry_spec, qstack_spec),
        out_shape=(jax.ShapeDtypeStruct((nb, block_g, sq_p, d), q0.dtype),
                   jax.ShapeDtypeStruct((n_blocks, nb, block_g, sq_p, d),
                                        q0.dtype)),
        input_output_aliases={1 + len(_W_KEYS): 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(kvp, *[w3[k] for k in _W_KEYS], q0p)
    out = out.reshape(b, sq_p, d)[:, :sq, :]
    return out, qstack


def _stack_backward(qstack, kv, w, dout, n_heads, gelu, cross, interpret):
    if interpret and w["wq"].shape[0] > 1:
        # One block per call (see _stack_forward): chain dq in XLA, sum
        # the per-block dkv contributions, stack per-block weight grads.
        n_blocks = w["wq"].shape[0]
        dq = dout
        dkv_total = None
        dws = [None] * n_blocks
        for l in reversed(range(n_blocks)):
            dq, dkv_l, dw_l = _stack_backward(
                qstack[l:l + 1], kv, _slice_w(w, l), dq, n_heads, gelu,
                cross, interpret)
            dkv_total = dkv_l if dkv_total is None else dkv_total + dkv_l
            dws[l] = dw_l
        dw = {k: jnp.concatenate([dws[l][k] for l in range(n_blocks)],
                                 axis=0) for k in _W_KEYS}
        return dq, dkv_total, dw

    n_blocks, nb, block_g, sq_p, d = qstack.shape
    b = nb * block_g
    sq = dout.shape[1]
    sk = kv.shape[1] if cross else sq
    sk_p = _round_up(sk, 16) if cross else sq_p
    head_dim = d // n_heads
    bwd_g = _bwd_block_g(block_g, d, w["wfc1"].shape[-1])
    if bwd_g != block_g:
        split = block_g // bwd_g
        qstack = qstack.reshape(n_blocks, nb * split, bwd_g, sq_p, d)
        nb, block_g = nb * split, bwd_g

    dq0 = _pad_tokens(dout, sq_p).reshape(nb, block_g, sq_p, d)
    kvp = (_pad_tokens(kv, sk_p).reshape(nb, block_g, sk_p, d)
           if cross else dq0)

    kernel = functools.partial(
        _stack_bwd_kernel, cross=cross, n_heads=n_heads, head_dim=head_dim,
        gelu=gelu, sk=sk, block_g=block_g, sq_p=sq_p, sk_p=sk_p)

    kv_spec = pl.BlockSpec((1, block_g, sk_p, d), lambda l, g: (g, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    qin_spec = pl.BlockSpec(
        (1, 1, block_g, sq_p, d),
        functools.partial(lambda l, g, _n: (_n - 1 - l, g, 0, 0, 0),
                          _n=n_blocks),
        memory_space=pltpu.VMEM)
    dq_spec = pl.BlockSpec((1, block_g, sq_p, d), lambda l, g: (g, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    dkv_spec = pl.BlockSpec((1, block_g, sk_p, d), lambda l, g: (g, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    w3 = _vec3(w)
    grad_specs = tuple(_weight_specs(w3, reverse_from=n_blocks))
    grad_shapes = tuple(jax.ShapeDtypeStruct(w3[k].shape, jnp.float32)
                        for k in _W_KEYS)

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks, nb),
        in_specs=[kv_spec, qin_spec] + _weight_specs(w3, n_blocks)
        + [dq_spec],
        out_specs=(dq_spec, dkv_spec) + grad_specs,
        out_shape=((jax.ShapeDtypeStruct((nb, block_g, sq_p, d),
                                         dout.dtype),
                    jax.ShapeDtypeStruct((nb, block_g, sk_p, d),
                                         dout.dtype))
                   + grad_shapes),
        input_output_aliases={2 + len(_W_KEYS): 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(kvp, qstack, *[w3[k] for k in _W_KEYS], dq0)

    dq0_out, dkv_out = outs[0], outs[1]
    dw = {k: outs[2 + i].reshape(w[k].shape).astype(w[k].dtype)
          for i, k in enumerate(_W_KEYS)}
    dq0_out = dq0_out.reshape(b, sq_p, d)[:, :sq, :]
    if cross:
        dkv_out = dkv_out.reshape(b, sk_p, d)[:, :sk, :]
    else:
        dkv_out = jnp.zeros_like(kv)
        dw["lnkv_g"] = jnp.zeros_like(w["lnkv_g"])
        dw["lnkv_b"] = jnp.zeros_like(w["lnkv_b"])
    return dq0_out, dkv_out, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_block_stack(q0: jax.Array, kv: jax.Array, w: Dict[str, jax.Array],
                      n_heads: int, gelu: str = "tanh", cross: bool = True,
                      interpret: bool = False) -> jax.Array:
    """Run a stack of pre-LN transformer blocks as fused Pallas kernels.

    Args:
      q0: (B, Sq, D) query/residual stream input.
      kv: (B, Sk, D) cross-attention keys/values (pass ``q0`` with
        ``cross=False`` for self-attention blocks; its cotangent is then
        zero and all gradient flows through ``q0``).
      w: stacked weights, each with leading dim L (see ``_W_KEYS``):
        LN scales/biases (L, D); wq (L, D, D); wkv (L, D, 2D) in
        head-major packed column order (k columns then v columns);
        wproj (L, D, D); wfc1 (L, D, F); wfc2 (L, F, D); biases to match.
        For self-attention slice the fused qkv kernel:
        wq = wqkv[:, :, :D], wkv = wqkv[:, :, D:].
      n_heads: head count; D/n_heads must be a multiple of 128.
      gelu: "tanh" | "erf" MLP activation.
    Returns:
      (B, Sq, D) output of the last block (final LN / heads stay outside).
    """
    out, _ = _stack_forward(q0, kv, w, n_heads, gelu, cross, interpret)
    return out


def _fbs_fwd(q0, kv, w, n_heads, gelu, cross, interpret):
    out, qstack = _stack_forward(q0, kv, w, n_heads, gelu, cross, interpret)
    return out, (qstack, kv, w)


def _fbs_bwd(n_heads, gelu, cross, interpret, residuals, dout):
    qstack, kv, w = residuals
    dq0, dkv, dw = _stack_backward(qstack, kv, w, dout, n_heads, gelu,
                                   cross, interpret)
    return dq0, dkv, dw


fused_block_stack.defvjp(_fbs_fwd, _fbs_bwd)


# ---------------------------------------------------------------------------
# Forward-only fusion: Pallas forward, XLA-autodiff (remat) backward.
#
# Round-2 measured the full Pallas fwd+bwd stack LOSING to XLA end-to-end
# (33.1 vs 26.6 ms/step at b256): the remat-per-block Pallas backward pays
# +33% FLOPs at MXU efficiency comparable to XLA's, so the recompute can
# never be won back (BASELINE.md "Fused Pallas block-stack kernels"). This
# variant isolates the OTHER half of the hypothesis: keep the fused Pallas
# forward (weights VMEM-resident across the batch sweep) but hand the
# backward to XLA — each block's backward recomputes its forward in plain
# XLA from the saved per-block residual-stream input (qstack), then
# autodiffs. Same +1 recompute FLOP profile as the full-Pallas remat
# backward, but at XLA's fusion quality. If THIS also loses, both fusion
# strategies are measured out and the 26.5 ms XLA floor claim is
# two-legged.
# ---------------------------------------------------------------------------

def _xla_block(x, kv, wl, n_heads: int, gelu: str, cross: bool):
    """One pre-LN block in plain jnp — the kernel's exact math (fp32 LN
    stats + fp32 softmax + packed wkv), used by the fwd-only backward.
    LayerNorm math is shared with the kernel (_layernorm_fwd) so the
    recompute can never desynchronize from the Pallas forward."""

    def ln(y, g, b):
        return _layernorm_fwd(y, g, b)[0]

    d = x.shape[-1]
    dh = d // n_heads
    h = ln(x, wl["ln1_g"], wl["ln1_b"])
    kvh = ln(kv, wl["lnkv_g"], wl["lnkv_b"]) if cross else h
    qp = h @ wl["wq"] + wl["bq"]
    kvp = kvh @ wl["wkv"] + wl["bkv"]
    b_, sq, _ = qp.shape
    sk = kvp.shape[1]
    q = qp.reshape(b_, sq, n_heads, dh).transpose(0, 2, 1, 3)
    k = kvp[..., :d].reshape(b_, sk, n_heads, dh).transpose(0, 2, 1, 3)
    v = kvp[..., d:].reshape(b_, sk, n_heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(dh))
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b_, sq, d)
    x = x + ctx @ wl["wproj"] + wl["bproj"]
    h2 = ln(x, wl["ln2_g"], wl["ln2_b"])
    a = h2 @ wl["wfc1"] + wl["bfc1"]
    a = jax.nn.gelu(a, approximate=(gelu == "tanh"))
    return x + a @ wl["wfc2"] + wl["bfc2"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_block_stack_fwd_xla_bwd(q0, kv, w, n_heads, gelu="tanh",
                                  cross=True, interpret=False):
    """``fused_block_stack`` with an XLA-autodiff backward (see above)."""
    out, _ = _stack_forward(q0, kv, w, n_heads, gelu, cross, interpret)
    return out


def _fbsx_fwd(q0, kv, w, n_heads, gelu, cross, interpret):
    out, qstack = _stack_forward(q0, kv, w, n_heads, gelu, cross, interpret)
    # qstack: (L, nb, G, sq_p, D) per-block padded inputs -> (L, B, Sq, D).
    b, sq, d = q0.shape
    n_blocks = w["wq"].shape[0]
    qstack = qstack.reshape(n_blocks, b, -1, d)[:, :, :sq, :]
    return out, (qstack, kv, w)


def _fbsx_bwd(n_heads, gelu, cross, interpret, residuals, dout):
    qstack, kv, w = residuals
    n_blocks = w["wq"].shape[0]
    dq = dout
    dkv = jnp.zeros_like(kv)
    dws = []
    for l in reversed(range(n_blocks)):
        _, vjp_fn = jax.vjp(
            lambda x, kv_, wl: _xla_block(x, kv_, wl, n_heads, gelu, cross),
            qstack[l], kv, {k: v[l] for k, v in w.items()})
        dq, dkv_l, dw_l = vjp_fn(dq)
        if cross:
            dkv = dkv + dkv_l
        dws.append(dw_l)
    dws.reverse()
    dw = {k: jnp.stack([dws[l][k] for l in range(n_blocks)])
          for k in w}
    if not cross:
        # Self-attention callers pass kv=q0; its cotangent is declared
        # zero (all flow rides dq), matching fused_block_stack's contract.
        dkv = jnp.zeros_like(kv)
    return dq, dkv, dw


fused_block_stack_fwd_xla_bwd.defvjp(_fbsx_fwd, _fbsx_bwd)
