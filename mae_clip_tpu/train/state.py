"""TrainState: one pytree carrying everything a resumable step needs.

The reference checkpoints only ``model.state_dict()`` (reference:
main.py:121), losing optimizer state and making true resume impossible
(SURVEY.md §5). Here params, optimizer state, BN batch stats, the step
counter and the RNG key live in a single pytree that is jitted through the
train step (donated) and checkpointed whole.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: optax.OptState
    batch_stats: Optional[Any]        # None for BN-free towers (ViT)
    rng: jax.Array                    # folded per step for dropout/masking
    # Exponential moving average of params (cfg.ema_decay > 0); None when
    # disabled so the pytree layout (and checkpoints) are unchanged.
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation,
               rng: jax.Array, batch_stats: Optional[Any] = None,
               ema: bool = False) -> "TrainState":
        import jax.numpy as jnp
        ema_params = (jax.tree_util.tree_map(jnp.array, params)
                      if ema else None)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), batch_stats=batch_stats,
                   rng=rng, ema_params=ema_params)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
