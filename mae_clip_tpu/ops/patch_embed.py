"""Fused masked patch embedding: gather(ids_keep) + linear projection.

MAE's encoder only embeds the ~25% visible patches. XLA expresses this as
``take_along_axis`` + matmul (two ops, one (B, K, D_in) intermediate in
HBM); this Pallas kernel fuses them: per batch row, the gather is a one-hot
matmul (MXU-friendly — Mosaic rejects unaligned dynamic row loads, so
select-by-matmul is the idiomatic TPU formulation) chained into the
projection, so the gathered pixels never leave VMEM:

    out[b] = onehot(ids[b], N) @ patches[b] @ W + bias     # (K, D_model)

Backward is exact via the XLA formulation under ``custom_vjp`` (same
recompute strategy as ops/attention.py). Parity vs the XLA path is tested
in interpret mode and the kernel compiles/runs on real v5e.

At this model family's sizes the XLA path is already fusion-friendly, so
the kernel is opt-in (``MAEViT(use_pallas_patch_embed=True)``); it exists
for the regime (large D_in / many patches) where the HBM intermediate
matters.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_masked_patch_embed(patches, ids, kernel, bias):
    gathered = jnp.take_along_axis(patches, ids[:, :, None], axis=1)
    out = jnp.einsum("bkd,de->bke", gathered, kernel,
                     preferred_element_type=jnp.float32)
    return (out + bias).astype(patches.dtype)


def _kernel(ids_ref, p_ref, w_ref, b_ref, o_ref):
    ids = ids_ref[0, 0]                                # (K,) int32 in VMEM
    n = p_ref.shape[1]
    k = ids.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (k, n), 1)
    onehot = (col == ids[:, None]).astype(p_ref.dtype)   # (K, N)
    gathered = jax.lax.dot_general(
        onehot, p_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (K, D_in)
    out = jax.lax.dot_general(
        gathered.astype(w_ref.dtype), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (K, D_m)
    o_ref[0] = (out + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pallas_forward(patches, ids, kernel, bias, interpret):
    b, n, d_in = patches.shape
    k = ids.shape[1]
    d_m = kernel.shape[1]
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            # (B, 1, K): Mosaic tiling requires the last two block dims to
            # be (8,128)-aligned or span the whole array.
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_m,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, d_m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, d_m), patches.dtype),
        interpret=interpret,
    )(ids.astype(jnp.int32).reshape(b, 1, k), patches, kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_patch_embed(patches, ids, kernel, bias, interpret: bool = False):
    """(B, N, D_in) patches, (B, K) indices -> (B, K, D_model)."""
    return _pallas_forward(patches, ids, kernel, bias, interpret)


def _fwd(patches, ids, kernel, bias, interpret):
    out = _pallas_forward(patches, ids, kernel, bias, interpret)
    return out, (patches, ids, kernel, bias)


def _bwd(interpret, residuals, g):
    patches, ids, kernel, bias = residuals

    def f(p, w, b):
        return _xla_masked_patch_embed(p, ids, w, b)

    _, vjp = jax.vjp(f, patches, kernel, bias)
    dp, dw, db = vjp(g)
    return dp, None, dw, db


masked_patch_embed.defvjp(_fwd, _bwd)
