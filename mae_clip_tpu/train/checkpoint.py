"""Checkpointing: async Orbax manager with best-metric retention + resume.

The reference saves bare ``model.state_dict()`` gated on best validation
loss (reference: main.py:109,118-122) and has no resume path — optimizer
state is lost (SURVEY.md §5). Here the FULL TrainState (params, optimizer
state, BN stats, step, rng) plus scheduler state is saved asynchronously
(Orbax), retained by best ``valid_loss``, and restorable mid-run.

``import_reference_checkpoint`` ingests the reference's ``.pth`` state_dicts
(via interop/torch_import.py) so reference checkpoints drop in unchanged.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from mae_clip_tpu.config import Config


class CheckpointManager:
    """Best-validation-retaining checkpoint manager (async save)."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 keep_period: Optional[int] = None):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_period,
            best_fn=lambda metrics: metrics["valid_loss"],
            best_mode="min",
            enable_async_checkpointing=True,
        )
        self._mngr = ocp.CheckpointManager(directory, options=options)

    def save(self, epoch: int, state: Any, metrics: Dict[str, float],
             scheduler: Optional[Dict] = None,
             best_loss: Optional[float] = None,
             is_best: bool = True) -> None:
        meta = {"scheduler": scheduler or {},
                "best_loss": best_loss,
                "metrics": {k: float(v) for k, v in metrics.items()}}
        self._mngr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta)),
            metrics={k: float(v) for k, v in metrics.items()})

    def restore(self, abstract_state: Any,
                step: Optional[int] = None) -> Tuple[Any, Dict]:
        """Restore (state, meta). ``step=None`` -> latest."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore()))
        return restored["state"], restored["meta"]

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()


class StepCheckpointManager:
    """Rolling step-granular checkpoints for preemption recovery.

    Complements :class:`CheckpointManager` (epoch-keyed, best-val
    retention — the reference's save semantics, main.py:118-122): this one
    is keyed by GLOBAL optimizer step, saved mid-epoch every
    ``Config.checkpoint_every_steps`` train batches, and retains only the
    newest few. It lives in its own directory so rotation can never evict
    the epoch manager's best-val checkpoints. Meta records (epoch,
    batches_done) so ``Trainer.restore_mid_epoch`` can fast-forward the
    deterministic per-epoch loader and resume bit-identically.
    """

    def __init__(self, directory: str, max_to_keep: int = 2):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=True,
        )
        self._mngr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, meta: Dict) -> None:
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta)))

    def restore(self, abstract_state: Any,
                step: Optional[int] = None) -> Tuple[Any, Dict]:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no step checkpoint found")
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore()))
        return restored["state"], restored["meta"]

    def peek_meta(self, step: Optional[int] = None) -> Dict:
        """Meta only (cheap: no array restore) — lets a resume path decide
        between this and an epoch checkpoint without loading state."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no step checkpoint found")
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
        return restored["meta"]

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()


def abstract_like(state: Any) -> Any:
    """Abstract pytree (shapes/dtypes) for StandardRestore."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, state)


def import_reference_checkpoint(path: str, cfg: Config) -> Dict:
    """Load a reference ``.pth`` CLIPModel state_dict as flax variables
    (params + batch_stats), reference: inference.py:18 load path."""
    from mae_clip_tpu.interop.torch_import import (import_clip_state_dict,
                                                   load_pth_state_dict)
    sd = load_pth_state_dict(path)
    return import_clip_state_dict(sd, model_name=cfg.model_name)


def load_variables(path: str, cfg: Config) -> Dict:
    """Load inference variables ({params[, batch_stats]}) from ANY supported
    checkpoint form — the CLI/serving counterpart of the reference's single
    ``load_state_dict(torch.load(path))`` (reference: inference.py:18):

    * ``*.pth``              — reference torch state_dict (name-mapped import)
    * Trainer run directory  — Orbax CheckpointManager layout written by
      ``Trainer.fit`` (``<dir>/<epoch>/state``); picks the best-valid-loss
      step, falling back to the latest
    * ``import-pth`` output  — bare Orbax StandardCheckpointer tree

    Orbax restores here pass no abstract pytree: shapes/dtypes come from the
    checkpoint's own metadata, so no model init is needed for inference.
    """
    if path.endswith(".pth"):
        return import_reference_checkpoint(path, cfg)
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)

    step_dirs = [d for d in os.listdir(path) if d.isdigit()]
    if step_dirs and os.path.isdir(
            os.path.join(path, max(step_dirs, key=int), "state")):
        mngr = ocp.CheckpointManager(path)
        try:
            step = mngr.best_step()
            if step is None:
                step = mngr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint steps under {path}")
            restored = mngr.restore(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore()))
        finally:
            mngr.close()
        state = restored["state"]
        params = state["params"]
        # EMA-trained runs serve the averaged weights (the same ones the
        # best-val selection evaluated) when the config says evals use EMA.
        if (cfg.ema_decay > 0 and cfg.ema_eval
                and state.get("ema_params") is not None):
            params = state["ema_params"]
        variables = {"params": params}
        if state.get("batch_stats") is not None:
            variables["batch_stats"] = state["batch_stats"]
        return variables

    restored = ocp.StandardCheckpointer().restore(path)
    return dict(restored)
