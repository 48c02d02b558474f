"""Sharding rules: how params and batches are laid out over the mesh.

Design (GSPMD + explicit-collective hybrid):
* the batch is sharded over the ``data`` axis (DP);
* tower weights follow Megatron-style tensor parallelism over the ``model``
  axis: column-parallel for up-projections (qkv, ffn_lin1/mlp_fc1: kernel
  sharded on the OUTPUT dim) and row-parallel for down-projections
  (out_lin/ffn_lin2/mlp_fc2/attn_proj: kernel sharded on the INPUT dim), so
  XLA/GSPMD inserts exactly one reduce(-scatter)/all-gather pair per block;
* everything else (embeddings, layernorms, projection heads) is replicated;
* the global-batch contrastive loss runs under ``shard_map`` with explicit
  ``all_gather``/``psum`` over ``data`` (ops/losses.py).

The reference has no analogue (single device); this is TPU-native scaling
per BASELINE.json config 5.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec for the kernel). First match wins. Biases and
# other 1-D params stay replicated (sharding tiny vectors wastes ICI).
_TP_RULES = [
    # Column-parallel (shard output features).
    (re.compile(r"(attn_qkv|q_lin|k_lin|v_lin|ffn_lin1|mlp_fc1)/kernel$"),
     P(None, "model")),
    # Row-parallel (shard input features).
    (re.compile(r"(attn_proj|out_lin|ffn_lin2|mlp_fc2)/kernel$"),
     P("model", None)),
    # Token embedding tables: shard the vocab dimension.
    (re.compile(r"word_embeddings/embedding$"), P("model", None)),
]


def _spec_for(path: str, ndim: int, model_axis_size: int) -> P:
    if model_axis_size > 1:
        for rule, spec in _TP_RULES:
            if rule.search(path):
                if len(spec) <= ndim:
                    return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a param/variable tree under ``mesh``."""
    model_size = mesh.shape.get("model", 1)

    def one(path, leaf):
        keys = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        spec = _spec_for(keys, getattr(leaf, "ndim", 0), model_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def opt_state_shardings(opt_state: Any, mesh: Mesh,
                        data_axis: str = "data",
                        zero1: bool = False) -> Any:
    """NamedSharding pytree for an optimizer state under ``mesh``.

    Default: fully replicated. ``zero1=True`` = ZeRO-1-style sharding:
    every array leaf whose leading dim divides the ``data`` axis (the
    AdamW mu/nu moment trees) is sharded ``P(data_axis)`` — the
    moment/update math is elementwise per parameter, so this changes no
    values; GSPMD computes the update sharded and gathers it where it
    meets the replicated params. Scalars (step counts, the dynamic LR
    scale) and non-dividing leaves stay replicated.
    """
    rep = NamedSharding(mesh, P())
    if not zero1:
        return jax.tree_util.tree_map(lambda _: rep, opt_state)
    d = mesh.shape.get(data_axis, 1)
    sharded = NamedSharding(mesh, P(data_axis))

    def one(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] >= d and shape[0] % d == 0:
            return sharded
        return rep

    return jax.tree_util.tree_map(one, opt_state)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully-replicated NamedSharding pytree."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: sharding, tree)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batch arrays sharded on the leading (batch) dimension."""
    return NamedSharding(mesh, P(data_axis))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh,
                data_axis: str = "data") -> Dict[str, jax.Array]:
    """Lay a batch out over the mesh ``data`` axis.

    Single controller: a plain ``device_put`` onto the batch sharding.

    Multi-controller (``jax.process_count() > 1``): each process holds
    only its LOCAL ``batch_size / num_processes`` rows (the loaders'
    ``host_id``/``num_hosts`` slicing), and ``device_put`` onto a
    sharding with non-addressable devices is not the JAX contract for
    host-local data — the global batch is assembled with
    ``jax.make_array_from_process_local_data`` instead, each process
    contributing its slice. Row placement follows each process's
    addressable block of the mesh; image/text/valid ride the same
    layout, so the contrastive pairing (and hence the loss) is
    independent of which global rows a process's block maps to.

    Inside a trace (superstep gather) the leaves are tracers; assembly
    from host data is meaningless there, so the traced path keeps the
    ``device_put`` sharding constraint (device stores are
    single-controller anyway — enforced by ``Trainer``).
    """
    import numpy as np

    sharding = batch_sharding(mesh, data_axis)
    leaves = jax.tree_util.tree_leaves(batch)
    if (jax.process_count() > 1
            and not any(isinstance(l, jax.core.Tracer) for l in leaves)):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
