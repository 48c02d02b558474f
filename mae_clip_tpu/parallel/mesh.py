"""Device mesh construction.

The reference has no distributed layer at all (single ``CFG.device``,
reference: config.py:13; no torch.distributed anywhere). The TPU-native
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis (batch/DP) and a
``model`` axis (tensor parallelism for tower weights); collectives ride ICI
within a slice. Multi-host initialization goes through
``jax.distributed.initialize`` (call :func:`maybe_initialize_distributed`
once per process before any device access).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from mae_clip_tpu.config import MeshConfig


def maybe_initialize_distributed() -> None:
    """Initialize JAX distributed when launched multi-host (no-op otherwise).

    Triggered by ``JAX_COORDINATOR_ADDRESS``; safe to call unconditionally
    at program start (before any device access). On recognized clusters
    (SLURM/MPI/TPU pods) ``jax.distributed.initialize`` auto-detects
    process count/id; on generic launches (docs/MULTIHOST.md, the
    two-process proof in tests/test_two_process_distributed.py) those come
    from ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``, which bare
    ``initialize()`` does NOT read in current JAX — pass them explicitly.
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    kw = {}
    if os.environ.get("JAX_NUM_PROCESSES") is not None:
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID") is not None:
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)


def create_mesh(data: int = -1, model: int = 1,
                axis_names: Sequence[str] = ("data", "model"),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2-D mesh. ``data=-1`` consumes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def mesh_from_config(mesh_cfg: MeshConfig,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    return create_mesh(mesh_cfg.data, mesh_cfg.model, mesh_cfg.axis_names,
                       devices)


def local_batch_size(global_batch: int, mesh: Mesh,
                     data_axis: str = "data") -> int:
    n_data = mesh.shape[data_axis]
    if global_batch % n_data != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel "
            f"size {n_data}")
    return global_batch // n_data
