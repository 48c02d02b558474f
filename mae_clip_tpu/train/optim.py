"""Optimizers and LR scheduling.

Two recipes from the reference are supported (see config.py):

* ``py``: one AdamW group over ALL trainable params, lr=1e-3, wd=1e-3
  (reference: main.py:101-103). The reference constructs a
  ReduceLROnPlateau but NEVER steps it (``step='epoch'`` while only the
  ``step=='batch'`` branch steps, main.py:60-61,107) — so the faithful
  default keeps the LR constant; ``scheduler_step='epoch'`` in the notebook
  recipe actually steps it.
* ``notebook``: per-tower groups (head 1e-3 / image 1e-4 / text 1e-5, weight
  decay on the heads only) + epoch-level ReduceLROnPlateau(valid_loss)
  (tutorial notebook cells 13, 47).

Frozen params (the reference freezes the text tower via requires_grad=False,
modules.py:35,42-43) are masked out of the optimizer entirely — like torch,
they receive neither updates nor weight decay.

LR scheduling is implemented as a global multiplicative ``scale`` applied to
the final update (exactly equivalent to scaling every group's lr, since both
the Adam step and the decoupled weight decay are linear in lr), stored in the
optimizer state so it checkpoints/restores with everything else.
``ReduceLROnPlateau`` reproduces torch defaults (mode='min', threshold=1e-4
relative) host-side.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mae_clip_tpu.config import Config


class ScaleByDynamicState(NamedTuple):
    scale: jax.Array  # f32 scalar, mutated host-side by the scheduler


def scale_by_dynamic() -> optax.GradientTransformation:
    """Multiply updates by a runtime-adjustable scalar kept in opt state."""

    def init_fn(params):
        del params
        return ScaleByDynamicState(scale=jnp.asarray(1.0, jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u: u * state.scale.astype(u.dtype), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_trainable_global_norm(max_norm: float, mask: Any
                                  ) -> optax.GradientTransformation:
    """Global-norm clip where the norm counts TRAINABLE leaves only.

    The joint backward materializes real grads for frozen towers (they are
    discarded by ``multi_transform``'s ``set_to_zero``), so a plain
    ``optax.clip_by_global_norm`` would let a frozen tower inflate the norm
    and over-clip the trainable updates — torch never counts
    ``requires_grad=False`` params. Scale matches torch
    ``clip_grad_norm_``: ``min(1, max_norm / (norm + 1e-6))``.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        sq = jax.tree_util.tree_map(
            lambda g, t: jnp.sum(jnp.square(g.astype(jnp.float32)))
            if t else jnp.zeros((), jnp.float32), updates, mask)
        norm = jnp.sqrt(sum(jax.tree_util.tree_leaves(sq)))
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        updates = jax.tree_util.tree_map(
            lambda g: g * scale.astype(g.dtype), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def _label_tree(params: Any, label_fn: Callable[[str], str]) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, _: label_fn(_path_str(p)), params)


def base_lr_schedule(cfg: Config, peak_lr: float):
    """Step-wise LR schedule for ``cfg.lr_schedule``.

    * ``constant`` — the reference's effective behavior (its plateau
      scheduler never steps in the .py recipe; see module docstring).
    * ``cosine`` — linear warmup over ``cfg.warmup_steps`` then cosine decay
      to 0 at ``cfg.decay_steps`` TOTAL steps (the MAE-paper pretraining
      schedule, arXiv:2111.06377 §A.1; also standard for from-scratch CLIP).
      Runs inside the jitted update (optimizer count), no host sync.
    """
    if cfg.lr_schedule == "constant":
        return peak_lr
    if cfg.lr_schedule == "cosine":
        if not cfg.decay_steps:
            raise ValueError("lr_schedule='cosine' needs decay_steps > 0 "
                             "(total train steps; the CLI computes it from "
                             "epochs x steps-per-epoch when unset)")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak_lr,
            warmup_steps=cfg.warmup_steps, decay_steps=cfg.decay_steps,
            end_value=0.0)
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def _adamw(lr, wd: float) -> optax.GradientTransformation:
    # torch AdamW defaults: betas=(0.9, 0.999), eps=1e-8.
    return optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=wd)


def _base_opt(cfg: Config, lr, wd: float) -> optax.GradientTransformation:
    """Per-group inner optimizer for ``cfg.optimizer``.

    * ``adamw`` — the reference's optimizer (main.py:101-103, torch
      defaults), and the default here.
    * ``lamb`` — layerwise-adaptive AdamW (arXiv:1904.00962): trust-ratio
      scaling per layer, the standard choice when the 32k-global-batch
      recipe pushes LR beyond plain AdamW's stability range.
    * ``lion`` — sign-momentum optimizer (arXiv:2302.06675): 1 moment
      instead of 2 (halves optimizer HBM — composes with
      ``mesh.shard_opt_state``), typical LR ~10x smaller than AdamW's.
    """
    if cfg.optimizer == "adamw":
        return _adamw(lr, wd)
    if cfg.optimizer == "lamb":
        return optax.lamb(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-6,
                          weight_decay=wd)
    if cfg.optimizer == "lion":
        return optax.lion(learning_rate=lr, b1=0.9, b2=0.99,
                          weight_decay=wd)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def param_groups(cfg: Config, params: Any) -> Any:
    """Label tree: each leaf -> "head" | "image" | "text" | "logit" | "frozen".

    "logit" = learnable loss scalars (SigLIP's ``logit_scale``/
    ``logit_bias``): head LR, but NO weight decay — decaying a log-
    temperature or a bias initialized at -10 toward 0 would fight the
    objective (standard practice for CLIP-family temperature params).
    """

    def group_of(path: str) -> str:
        if path.startswith("text_encoder"):
            return "frozen" if not cfg.text_trainable else "text"
        if path.startswith("image_encoder"):
            return "frozen" if not cfg.trainable else "image"
        if path.startswith("logit_"):
            return "logit"
        return "head"

    return _label_tree(params, group_of)


def trainable_mask(cfg: Config, params: Any) -> Any:
    """Bool tree, True where the optimizer updates the leaf. The train step
    skips the ``p + update`` entirely for frozen leaves: with ``0 * scale``
    updates XLA cannot fold the add (scale is a runtime value, 0*scale is
    not provably 0), so every step would read+write the whole frozen tower
    (~0.5 GB/step HBM for a frozen DistilBERT); an identity output aliases
    the donated input buffer instead — zero traffic."""
    return jax.tree_util.tree_map(lambda g: g != "frozen",
                                  param_groups(cfg, params))


def make_optimizer(cfg: Config, params: Any) -> optax.GradientTransformation:
    """Build the optimizer for ``cfg.recipe`` over a CLIPModel param tree."""

    sched = lambda peak: base_lr_schedule(cfg, peak)
    opt = lambda lr, wd: _base_opt(cfg, lr, wd)
    if cfg.recipe == "py":
        transforms = {
            "head": opt(sched(cfg.lr), cfg.weight_decay),
            "image": opt(sched(cfg.lr), cfg.weight_decay),
            "text": opt(sched(cfg.lr), cfg.weight_decay),
            "logit": opt(sched(cfg.lr), 0.0),
            "frozen": optax.set_to_zero(),
        }
    elif cfg.recipe == "notebook":
        transforms = {
            "head": opt(sched(cfg.head_lr), cfg.weight_decay),
            "image": opt(sched(cfg.image_encoder_lr), 0.0),
            "text": opt(sched(cfg.text_encoder_lr), 0.0),
            "logit": opt(sched(cfg.head_lr), 0.0),
            "frozen": optax.set_to_zero(),
        }
    else:
        raise ValueError(f"unknown recipe {cfg.recipe!r}")

    labels = param_groups(cfg, params)
    pre = []
    if cfg.grad_clip_norm > 0:
        pre.append(clip_by_trainable_global_norm(
            cfg.grad_clip_norm, trainable_mask(cfg, params)))
    return optax.chain(
        *pre,
        optax.multi_transform(transforms, labels),
        scale_by_dynamic(),
    )


# ---------------------------------------------------------------------------
# LR scale plumbing
# ---------------------------------------------------------------------------

def _find_dynamic_state(opt_state) -> Tuple[int, ScaleByDynamicState]:
    for i, s in enumerate(opt_state):
        if isinstance(s, ScaleByDynamicState):
            return i, s
    raise ValueError("optimizer state has no ScaleByDynamicState "
                     "(was the optimizer built by make_optimizer?)")


def get_lr_scale(opt_state) -> float:
    _, s = _find_dynamic_state(opt_state)
    return float(s.scale)


def set_lr_scale(opt_state, scale: float):
    """Return opt_state with the dynamic LR scale replaced."""
    i, s = _find_dynamic_state(opt_state)
    new = ScaleByDynamicState(scale=jnp.asarray(scale, jnp.float32))
    return tuple(new if j == i else st for j, st in enumerate(opt_state))


def current_lr(cfg: Config, opt_state, step: Optional[int] = None) -> float:
    """First param-group LR, mirroring reference utils.py:18-20 (get_lr).
    With a step-wise schedule, pass ``step`` (TrainState.step) to evaluate
    the schedule host-side."""
    peak = cfg.lr if cfg.recipe == "py" else cfg.head_lr
    base = base_lr_schedule(cfg, peak)
    if callable(base):
        base = float(base(0 if step is None else step))
    return base * get_lr_scale(opt_state)


# ---------------------------------------------------------------------------
# ReduceLROnPlateau (torch semantics, host-side)
# ---------------------------------------------------------------------------

class ReduceLROnPlateau:
    """Faithful torch ReduceLROnPlateau(mode='min') on an LR *scale*.

    The reference constructs this with patience=CFG.patience=2 and
    factor=CFG.factor=0.5 (reference: main.py:104-106). ``step(metric)``
    returns the new scale to install via :func:`set_lr_scale`.
    """

    def __init__(self, patience: int = 2, factor: float = 0.5,
                 threshold: float = 1e-4, min_scale: float = 0.0):
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.min_scale = min_scale
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.scale = 1.0

    def is_better(self, metric: float) -> bool:
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        if self.is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.num_bad_epochs = 0
        return self.scale

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs,
                "scale": self.scale}

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
        self.scale = d["scale"]
