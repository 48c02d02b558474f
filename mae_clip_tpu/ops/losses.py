"""Contrastive and reconstruction losses.

``clip_soft_ce_loss`` reproduces the reference loss exactly (reference:
CLIP.py:34-43,46-52), including its quirks:

* soft targets ``softmax((img@img.T + txt@txt.T)/2 * T)`` that RECEIVE
  gradients (the reference never detaches them);
* embeddings are NOT L2-normalized in the training loss (normalization only
  happens at inference, reference: inference.py:42-43);
* the temperature asymmetry: logits are divided by T while targets are
  multiplied by T;
* ``loss = mean((images_loss + texts_loss) / 2)`` over the batch.

TPU needs static shapes, so the ragged final batch (the reference's
DataLoader has no ``drop_last``, reference: main.py:42-47) is padded and a
``valid`` mask excludes pad rows/columns from softmaxes and from the mean,
keeping metric parity with the reference's count-weighted averaging.

``global_clip_soft_ce_loss`` is the mesh-scaled version: embeddings are
all-gathered over the ``data`` axis (XLA lowers this to ICI collectives) so
the logits become global_B x global_B while each shard only materializes its
local rows. Gradients flow through ``jax.lax.all_gather`` (its transpose is
``psum_scatter``), so no custom VJP is needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Large-but-finite mask value: finfo.min overflows to -inf once the row max
# is subtracted inside softmax, and 0 * -inf = nan poisons the soft-CE sum.
_NEG_INF = -1e30


def _masked_log_softmax(logits: jax.Array, col_valid: Optional[jax.Array]
                        ) -> jax.Array:
    """log_softmax over the last axis with invalid columns excluded."""
    if col_valid is not None:
        logits = jnp.where(col_valid[None, :], logits, _NEG_INF)
    return jax.nn.log_softmax(logits, axis=-1)


def _masked_softmax(logits: jax.Array, col_valid: Optional[jax.Array]
                    ) -> jax.Array:
    if col_valid is not None:
        logits = jnp.where(col_valid[None, :], logits, _NEG_INF)
        return jnp.where(col_valid[None, :],
                         jax.nn.softmax(logits, axis=-1), 0.0)
    return jax.nn.softmax(logits, axis=-1)


def _soft_ce_rows(logits: jax.Array, targets: jax.Array,
                  col_valid: Optional[jax.Array]) -> jax.Array:
    """Row-wise soft cross-entropy with invalid columns contributing zero."""
    logp = _masked_log_softmax(logits, col_valid)
    terms = -targets * logp
    if col_valid is not None:
        terms = jnp.where(col_valid[None, :], terms, 0.0)
    return jnp.sum(terms, axis=-1)


def clip_soft_ce_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Soft-target symmetric InfoNCE, exact reference math (CLIP.py:34-43).

    Args:
      image_embeddings: (B, D) projected image embeddings (unnormalized).
      text_embeddings: (B, D) projected text embeddings (unnormalized).
      temperature: the reference's ``CFG.temperature``.
      valid: optional (B,) bool mask; False rows are padding.

    Returns:
      Scalar mean loss over valid rows.
    """
    img = image_embeddings.astype(jnp.float32)
    txt = text_embeddings.astype(jnp.float32)

    logits = jnp.matmul(txt, img.T, preferred_element_type=jnp.float32)
    logits = logits / temperature
    images_similarity = jnp.matmul(img, img.T, preferred_element_type=jnp.float32)
    texts_similarity = jnp.matmul(txt, txt.T, preferred_element_type=jnp.float32)
    targets = _masked_softmax(
        (images_similarity + texts_similarity) / 2 * temperature, valid)

    texts_loss = _soft_ce_rows(logits, targets, valid)
    images_loss = _soft_ce_rows(logits.T, targets.T, valid)
    per_row = (images_loss + texts_loss) / 2.0
    if valid is None:
        return jnp.mean(per_row)
    per_row = jnp.where(valid, per_row, 0.0)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(valid), 1)


def global_clip_soft_ce_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
) -> jax.Array:
    """Global-batch version of :func:`clip_soft_ce_loss` for use inside
    ``shard_map``/``pjit`` over a mesh ``data`` axis.

    Each shard holds (B_local, D) embeddings. Both embedding sets are
    all-gathered so the effective contrastive batch is global_B = B_local *
    axis_size. Each shard materializes only its local rows of the global
    logits (B_local x global_B) plus one gathered (global_B,) logsumexp
    vector needed for the transposed (image-side) loss. The result equals
    :func:`clip_soft_ce_loss` on the concatenated global batch bit-for-bit
    up to fp reduction order.
    """
    img = image_embeddings.astype(jnp.float32)
    txt = text_embeddings.astype(jnp.float32)
    b_local = img.shape[0]
    if valid is None:
        valid = jnp.ones((b_local,), dtype=bool)

    g_img = jax.lax.all_gather(img, axis_name, tiled=True)     # (GB, D)
    g_txt = jax.lax.all_gather(txt, axis_name, tiled=True)     # (GB, D)
    g_valid = jax.lax.all_gather(valid, axis_name, tiled=True)  # (GB,)

    t = temperature
    # Local text rows of the global logits / similarity matrices.
    logits_rows = jnp.matmul(txt, g_img.T, preferred_element_type=jnp.float32) / t
    sim_rows = (jnp.matmul(img, g_img.T, preferred_element_type=jnp.float32)
                + jnp.matmul(txt, g_txt.T, preferred_element_type=jnp.float32)
                ) / 2 * t

    sim_rows_m = jnp.where(g_valid[None, :], sim_rows, _NEG_INF)
    targets_rows = jnp.where(g_valid[None, :],
                             jax.nn.softmax(sim_rows_m, axis=-1), 0.0)
    texts_loss = _soft_ce_rows(logits_rows, targets_rows, g_valid)

    # Image-side loss needs COLUMNS of the global targets matrix: entry
    # (j, i) = exp(sim[j, i] - logsumexp_j). The row normalizers are global,
    # so gather the local (B_local,) logsumexp vector into (GB,).
    row_lse = jax.nn.logsumexp(sim_rows_m, axis=-1)              # (Bl,)
    g_row_lse = jax.lax.all_gather(row_lse, axis_name, tiled=True)  # (GB,)

    # sim columns for local images: (GB, Bl); entry (j, i) = sim[j, i].
    sim_cols = (jnp.matmul(g_img, img.T, preferred_element_type=jnp.float32)
                + jnp.matmul(g_txt, txt.T, preferred_element_type=jnp.float32)
                ) / 2 * t
    sim_cols = jnp.where(valid[None, :], sim_cols, _NEG_INF)
    targets_cols = jnp.exp(sim_cols - g_row_lse[:, None])        # (GB, Bl)
    targets_cols = jnp.where(g_valid[:, None], targets_cols, 0.0)

    # logits.T local rows: (Bl, GB); entry (i, j) = img_i . txt_j / T.
    logitsT_rows = jnp.matmul(img, g_txt.T, preferred_element_type=jnp.float32) / t
    images_loss = _soft_ce_rows(logitsT_rows, targets_cols.T, g_valid)

    per_row = (images_loss + texts_loss) / 2.0
    per_row = jnp.where(valid, per_row, 0.0)
    local_sum = jnp.sum(per_row)
    global_sum = jax.lax.psum(local_sum, axis_name)
    global_count = jax.lax.psum(jnp.sum(valid.astype(jnp.float32)), axis_name)
    return global_sum / jnp.maximum(global_count, 1.0)


def global_clip_soft_ce_loss_chunked(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
    chunk_size: int = 1024,
) -> jax.Array:
    """Blockwise global contrastive loss: same math as
    :func:`global_clip_soft_ce_loss` without ever materializing a
    (B_local, global_B) matrix.

    For a 32k global batch the unchunked loss needs four 32k-wide score
    matrices per shard; this version streams the gathered embeddings in
    ``chunk_size`` columns with flash-style online logsumexp (cf. "Breaking
    the Memory Barrier", arXiv:2410.17243), so peak memory is
    O(B_local x chunk_size) regardless of global batch. Two passes:

    1. online logsumexp of the soft-target similarity rows (Z_sim) and of
       both logits orientations (Z_log, Z_logT);
    2. Z_sim is all-gathered (a (GB,) vector - the only global state), then
       expectation terms stream again per chunk.

    Gradients flow through both scans and the gathers (scan/while are
    differentiable; all_gather's transpose is psum_scatter).
    """
    img = image_embeddings.astype(jnp.float32)
    txt = text_embeddings.astype(jnp.float32)
    b_local, dim = img.shape
    if valid is None:
        valid = jnp.ones((b_local,), dtype=bool)
    t = temperature

    g_img = jax.lax.all_gather(img, axis_name, tiled=True)      # (GB, D)
    g_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
    g_valid = jax.lax.all_gather(valid, axis_name, tiled=True)
    gb = g_img.shape[0]
    num_chunks = -(-gb // chunk_size)
    pad = num_chunks * chunk_size - gb

    def chunks_of(x, fill=0.0):
        xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                     constant_values=fill)
        return xp.reshape((num_chunks, chunk_size) + x.shape[1:])

    c_img = chunks_of(g_img)
    c_txt = chunks_of(g_txt)
    c_valid = chunks_of(g_valid.astype(jnp.float32))

    def row_scores(ci, ct, kind):
        """(B_local, chunk) scores of the requested matrix's local rows."""
        if kind == "sim":
            return (jnp.matmul(img, ci.T, preferred_element_type=jnp.float32)
                    + jnp.matmul(txt, ct.T,
                                 preferred_element_type=jnp.float32)) / 2 * t
        if kind == "logits":       # rows = local texts vs global images
            return jnp.matmul(txt, ci.T,
                              preferred_element_type=jnp.float32) / t
        # rows = local images vs global texts (logits.T rows)
        return jnp.matmul(img, ct.T, preferred_element_type=jnp.float32) / t

    # --- pass 1: online logsumexp for sim / logits / logitsT rows ---
    # Both scan bodies are rematerialized (jax.checkpoint): without it the
    # scan vjp STACKS each iteration's (B_local, chunk) score matrices as
    # residuals — at the 32k-on-one-chip scale that is num_chunks x three
    # 512 MiB buffers (~12 GiB), defeating the whole point of chunking.
    # Recomputing the row_scores matmuls in the backward is the standard
    # blockwise-loss trade (arXiv:2410.17243) and costs a small fraction
    # of the tower FLOPs.
    @jax.checkpoint
    def lse_pass(carry, chunk):
        ci, ct, cv = chunk
        out = []
        for (m, s), kind in zip(carry, ("sim", "logits", "logitsT")):
            x = jnp.where(cv[None, :] > 0, row_scores(ci, ct, kind),
                          _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(x, axis=1))
            s_new = (s * jnp.exp(m - m_new)
                     + jnp.sum(jnp.exp(x - m_new[:, None]), axis=1))
            out.append((m_new, s_new))
        return tuple(out), None

    def _varying(x):
        # Mark the scan carry as varying over the data axis (shard_map VMA
        # tracking): the body mixes it with sharded operands.
        return jax.lax.pcast(x, axis_name, to="varying")

    init = tuple((_varying(jnp.full((b_local,), -jnp.inf)),
                  _varying(jnp.zeros((b_local,))))
                 for _ in range(3))
    (m_sim, s_sim), (m_log, s_log), (m_logT, s_logT) = jax.lax.scan(
        lse_pass, init, (c_img, c_txt, c_valid))[0]
    z_sim = m_sim + jnp.log(s_sim)       # (B_local,)
    z_log = m_log + jnp.log(s_log)
    z_logT = m_logT + jnp.log(s_logT)

    # The image-side targets need row normalizers of ALL global sim rows.
    g_z_sim = jax.lax.all_gather(z_sim, axis_name, tiled=True)   # (GB,)
    c_z_sim = chunks_of(g_z_sim, fill=0.0)

    # --- pass 2: expectation terms ---
    # texts_loss[i]  = z_log[i]  - sum_j p_sim[i,j] * logits[i,j]
    # images_loss[i] = sum_j t_ji * (z_logT[i] - logitsT[i,j]),
    #   with t_ji = exp(sim[j,i] - z_sim[j]) and sum_j t_ji == 1 over valid j.
    @jax.checkpoint
    def acc_pass(carry, chunk):
        acc_txt, acc_img = carry
        ci, ct, cv, cz = chunk
        sim = row_scores(ci, ct, "sim")
        logits = row_scores(ci, ct, "logits")
        logitsT = row_scores(ci, ct, "logitsT")
        p_sim = jnp.where(cv[None, :] > 0,
                          jnp.exp(sim - z_sim[:, None]), 0.0)
        acc_txt = acc_txt + jnp.sum(p_sim * logits, axis=1)
        # sim[j, i] for global j in this chunk == sim rows transposed:
        # row_scores computes local-row scores; entry (i, jc) here equals
        # sim[local_i, global_jc] == sim[global_jc, local_i] by symmetry of
        # the (img@img.T + txt@txt.T)/2 matrix.
        t_cols = jnp.where(cv[None, :] > 0,
                           jnp.exp(sim - cz[None, :]), 0.0)
        acc_img = acc_img + jnp.sum(t_cols * (z_logT[:, None] - logitsT),
                                    axis=1)
        return (acc_txt, acc_img), None

    (acc_txt, acc_img), _ = jax.lax.scan(
        acc_pass, (_varying(jnp.zeros((b_local,))),
                   _varying(jnp.zeros((b_local,)))),
        (c_img, c_txt, c_valid, c_z_sim))

    texts_loss = z_log - acc_txt
    images_loss = acc_img
    per_row = (images_loss + texts_loss) / 2.0
    per_row = jnp.where(valid, per_row, 0.0)
    global_sum = jax.lax.psum(jnp.sum(per_row), axis_name)
    global_count = jax.lax.psum(jnp.sum(valid.astype(jnp.float32)),
                                axis_name)
    return global_sum / jnp.maximum(global_count, 1.0)


def temperature_of(logit_scale: jax.Array) -> jax.Array:
    """Temperature from a CLIP-style log-space scale param.

    The CLIP paper (arXiv:2103.00020 §2.5) learns ``s`` with logits scaled
    by ``exp(s)`` clamped at 100; the reference's formulation divides by a
    temperature instead, so ``T = 1/clip(exp(s), 100)`` maps one onto the
    other (``Config.learnable_temperature``).
    """
    return 1.0 / jnp.minimum(jnp.exp(logit_scale), 100.0)


# Shared with the retrieval/zero-shot paths so the loss's normalization can
# never drift from the scoring that consumes the same embeddings.
from mae_clip_tpu.ops.retrieval import l2_normalize as _l2_normalize  # noqa: E402


def siglip_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    logit_scale: jax.Array,
    logit_bias: jax.Array,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Pairwise sigmoid contrastive loss (SigLIP, arXiv:2303.15343 eq. 1).

    A beyond-reference alternative to the softmax objective
    (``Config.contrastive_loss='siglip'``): every image/text pair is an
    independent binary classification (positive on the diagonal), so there
    is no batch-wide softmax normalizer — the loss decomposes over pairs,
    which is what makes the ring-collective global version
    (:func:`global_siglip_loss`) possible without any all-gather.

    Unlike the reference objective, embeddings ARE L2-normalized here and
    the temperature is a LEARNABLE log-space scalar plus a learnable bias
    (paper init: t' = log 10, b = -10), owned by ``CLIPModel`` when the
    config selects this loss.

    Args:
      image_embeddings: (B, D) projected image embeddings.
      text_embeddings: (B, D) projected text embeddings.
      logit_scale: scalar, log-space temperature t' (logits use exp(t')).
      logit_bias: scalar bias b added to every logit.
      valid: optional (B,) bool mask; False rows are padding and contribute
        neither pairs nor denominator.

    Returns:
      Scalar: sum over valid pairs of -log sigmoid(m_ij * logits_ij)
      divided by the number of valid rows (the paper's 1/|B|).
    """
    img = _l2_normalize(image_embeddings.astype(jnp.float32))
    txt = _l2_normalize(text_embeddings.astype(jnp.float32))
    b = img.shape[0]
    logits = (jnp.exp(logit_scale)
              * jnp.matmul(img, txt.T, preferred_element_type=jnp.float32)
              + logit_bias)
    labels = 2.0 * jnp.eye(b, dtype=jnp.float32) - 1.0
    # -log sigmoid(m * z) == softplus(-m * z), numerically stable.
    pair_loss = jax.nn.softplus(-labels * logits)
    if valid is None:
        return jnp.sum(pair_loss) / b
    v = valid.astype(jnp.float32)
    pair_loss = pair_loss * v[:, None] * v[None, :]
    return jnp.sum(pair_loss) / jnp.maximum(jnp.sum(v), 1.0)


def global_siglip_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    logit_scale: jax.Array,
    logit_bias: jax.Array,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
) -> jax.Array:
    """Global-batch SigLIP via an ICI ring, for use inside ``shard_map``.

    The paper's "chunked" recipe (arXiv:2303.15343 §3.3): because the
    sigmoid loss decomposes over pairs, each device computes its local
    B_local x B_local block, then the TEXT block (plus its valid mask)
    rotates one neighbor hop around the ring ``axis_size - 1`` times
    (``jax.lax.ppermute`` — XLA lowers neighbor permutes to ICI
    send/recv). Peak memory stays O(B_local^2) for any global batch, and
    no (GB, D) all-gather buffer ever exists. Positives appear only in
    step 0 (a device's own text block holds its global diagonal).
    Gradients flow through ``ppermute`` (its transpose is the reverse
    permute), so the result — value and grads — equals
    :func:`siglip_loss` on the concatenated global batch up to fp
    reduction order.
    """
    img = _l2_normalize(image_embeddings.astype(jnp.float32))
    txt = _l2_normalize(text_embeddings.astype(jnp.float32))
    b_local = img.shape[0]
    if valid is None:
        valid = jnp.ones((b_local,), dtype=bool)
    v = valid.astype(jnp.float32)

    axis_size = jax.lax.psum(1, axis_name)  # static Python int
    perm = [(d, (d + 1) % axis_size) for d in range(axis_size)]
    scale = jnp.exp(logit_scale)
    diag_labels = 2.0 * jnp.eye(b_local, dtype=jnp.float32) - 1.0

    txt_blk, v_blk = txt, v
    total = jnp.zeros((), jnp.float32)
    for step in range(axis_size):
        logits = (scale * jnp.matmul(img, txt_blk.T,
                                     preferred_element_type=jnp.float32)
                  + logit_bias)
        labels = diag_labels if step == 0 else -1.0
        pair_loss = jax.nn.softplus(-labels * logits)
        total = total + jnp.sum(pair_loss * v[:, None] * v_blk[None, :])
        if step < axis_size - 1:
            txt_blk = jax.lax.ppermute(txt_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    global_sum = jax.lax.psum(total, axis_name)
    global_rows = jax.lax.psum(jnp.sum(v), axis_name)
    return global_sum / jnp.maximum(global_rows, 1.0)


def clip_hard_ce_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Standard CLIP objective (arXiv:2103.00020 fig. 3 pseudocode).

    A beyond-reference alternative (``Config.contrastive_loss='clip'``) to
    the reference's soft-target loss: embeddings ARE L2-normalized, targets
    are the identity (hard labels), and the loss is the symmetric mean of
    the two cross-entropies. Pairs with ``Config.learnable_temperature``
    (the paper learns ``T`` via ``exp(s)`` clamped at 100) but also accepts
    a fixed temperature.

    Args:
      image_embeddings: (B, D) projected image embeddings (normalized here).
      text_embeddings: (B, D) projected text embeddings (normalized here).
      temperature: logits are ``sim / T`` (scalar; may be traced/learnable).
      valid: optional (B,) bool mask; False rows are padding and contribute
        neither rows nor softmax columns.

    Returns:
      Scalar mean loss over valid rows.
    """
    img = _l2_normalize(image_embeddings.astype(jnp.float32))
    txt = _l2_normalize(text_embeddings.astype(jnp.float32))
    logits = jnp.matmul(txt, img.T,
                        preferred_element_type=jnp.float32) / temperature
    # Rows: texts over image columns; transpose: images over text columns.
    logp_txt = _masked_log_softmax(logits, valid)
    logp_img = _masked_log_softmax(logits.T, valid)
    per_row = -(jnp.diagonal(logp_txt) + jnp.diagonal(logp_img)) / 2.0
    if valid is None:
        return jnp.mean(per_row)
    per_row = jnp.where(valid, per_row, 0.0)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(valid), 1)


def global_clip_hard_ce_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
    chunk_size: int = 0,
) -> jax.Array:
    """Global-batch :func:`clip_hard_ce_loss` for use inside ``shard_map``.

    Both embedding sets are all-gathered over ``axis_name`` so the softmax
    normalizers span the global batch; each shard materializes only its
    local rows (B_local x global_B) of either logits orientation. A row's
    positive is its own global column ``axis_index * B_local + row``.

    With ``chunk_size > 0`` the gathered columns are streamed in blocks
    with an online logsumexp (flash-style), so peak memory is
    O(B_local x chunk_size) regardless of global batch — hard labels need
    only one pass (the positive logit is picked up in the block that
    covers it), unlike the two-pass soft-target version
    (:func:`global_clip_soft_ce_loss_chunked`). Gradients flow through the
    gathers and the scan. Equals :func:`clip_hard_ce_loss` on the
    concatenated global batch up to fp reduction order.
    """
    img = _l2_normalize(image_embeddings.astype(jnp.float32))
    txt = _l2_normalize(text_embeddings.astype(jnp.float32))
    b_local = img.shape[0]
    if valid is None:
        valid = jnp.ones((b_local,), dtype=bool)
    t = temperature
    own = jax.lax.axis_index(axis_name) * b_local + jnp.arange(b_local)

    g_img = jax.lax.all_gather(img, axis_name, tiled=True)      # (GB, D)
    g_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
    g_valid = jax.lax.all_gather(valid, axis_name, tiled=True)

    if chunk_size <= 0:
        logits_txt = jnp.matmul(txt, g_img.T,
                                preferred_element_type=jnp.float32) / t
        logits_img = jnp.matmul(img, g_txt.T,
                                preferred_element_type=jnp.float32) / t
        m_txt = jnp.where(g_valid[None, :], logits_txt, _NEG_INF)
        m_img = jnp.where(g_valid[None, :], logits_img, _NEG_INF)
        z_txt = jax.nn.logsumexp(m_txt, axis=1)
        z_img = jax.nn.logsumexp(m_img, axis=1)
        own_col = own[:, None]
        own_txt = jnp.take_along_axis(logits_txt, own_col, axis=1)[:, 0]
        own_img = jnp.take_along_axis(logits_img, own_col, axis=1)[:, 0]
    else:
        gb = g_img.shape[0]
        num_chunks = -(-gb // chunk_size)
        pad = num_chunks * chunk_size - gb

        def chunks_of(x, fill=0.0):
            xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                         constant_values=fill)
            return xp.reshape((num_chunks, chunk_size) + x.shape[1:])

        def _varying(x):
            return jax.lax.pcast(x, axis_name, to="varying")

        col_ids = jnp.arange(num_chunks * chunk_size).reshape(
            (num_chunks, chunk_size))

        # Rematerialized for the same reason as the soft chunked loss's
        # passes: the scan vjp would otherwise stack each chunk's
        # (B_local, chunk) logits as residuals.
        @jax.checkpoint
        def pass_fn(carry, chunk):
            (mt, st, ot), (mi, si, oi) = carry
            ci, ct, cv, cols = chunk
            out = []
            for (m, s, o), rows, cols_emb in (
                    ((mt, st, ot), txt, ci), ((mi, si, oi), img, ct)):
                x = jnp.matmul(rows, cols_emb.T,
                               preferred_element_type=jnp.float32) / t
                xm = jnp.where(cv[None, :] > 0, x, _NEG_INF)
                m_new = jnp.maximum(m, jnp.max(xm, axis=1))
                s_new = (s * jnp.exp(m - m_new)
                         + jnp.sum(jnp.exp(xm - m_new[:, None]), axis=1))
                # Positive logit: the one block whose columns cover `own`
                # contributes it (pad columns have ids >= GB, never hit).
                hit = cols[None, :] == own[:, None]
                o_new = o + jnp.sum(jnp.where(hit, x, 0.0), axis=1)
                out.append((m_new, s_new, o_new))
            return tuple(out), None

        init_one = (
            _varying(jnp.full((b_local,), -jnp.inf)),
            _varying(jnp.zeros((b_local,))),
            _varying(jnp.zeros((b_local,))),
        )
        ((mt, st, own_txt), (mi, si, own_img)), _ = jax.lax.scan(
            pass_fn, (init_one, init_one),
            (chunks_of(g_img), chunks_of(g_txt),
             chunks_of(g_valid.astype(jnp.float32)), col_ids))
        z_txt = mt + jnp.log(st)
        z_img = mi + jnp.log(si)

    per_row = ((z_txt - own_txt) + (z_img - own_img)) / 2.0
    per_row = jnp.where(valid, per_row, 0.0)
    global_sum = jax.lax.psum(jnp.sum(per_row), axis_name)
    global_count = jax.lax.psum(jnp.sum(valid.astype(jnp.float32)),
                                axis_name)
    return global_sum / jnp.maximum(global_count, 1.0)


def mae_reconstruction_loss(
    pred_patches: jax.Array,
    target_patches: jax.Array,
    mask: jax.Array,
    norm_pix: bool = True,
) -> jax.Array:
    """Pixel-MSE over MASKED patches only (MAE objective; He et al. 2021).

    Args:
      pred_patches: (B, N, P) decoder predictions per patch.
      target_patches: (B, N, P) patchified input pixels.
      mask: (B, N) float/bool; 1 where the patch was masked (to reconstruct).
      norm_pix: normalize each target patch to zero mean / unit var first.
    """
    target = target_patches.astype(jnp.float32)
    pred = pred_patches.astype(jnp.float32)
    if norm_pix:
        mean = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean(jnp.square(pred - target), axis=-1)    # (B, N)
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy_soft(preds: jax.Array, targets: jax.Array,
                       reduction: str = "none") -> jax.Array:
    """Row-wise soft cross-entropy, mirroring reference CLIP.py:46-52."""
    loss = jnp.sum(-targets * jax.nn.log_softmax(preds, axis=-1), axis=1)
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    raise ValueError(f"unknown reduction {reduction!r}")
