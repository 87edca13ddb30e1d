"""Train state and optimizer construction.

The reference uses ``transformers.AdamW`` (lr 3e-5, weight decay 0 unless
configured; run/train_egoclip.py:72-73) with a manual step-LR decay of 0.1
at epoch milestones [60, 80] applied after each epoch
(trainer_egoclip.py:75-80, 178).  Here that is an optax chain with an
epoch-aware schedule resolved per optimizer step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Flax TrainState (params/opt_state/step + apply_fn/tx)."""


def make_step_lr(base_lr: float, milestones: Sequence[int],
                 steps_per_epoch: int, gamma: float = 0.1):
    """Epoch-milestone decay. The reference adjusts the LR at the *end* of
    each epoch, so epoch e >= 2 trains at base * gamma^{#milestones <= e-1};
    epoch 1 at base."""
    ms = jnp.asarray(list(milestones), jnp.int32)

    def schedule(step):
        completed_epochs = step // max(steps_per_epoch, 1)  # = e - 1
        n = jnp.sum(completed_epochs >= ms)
        return base_lr * (gamma ** n)

    return schedule


def make_optimizer(base_lr: float = 3e-5,
                   milestones: Sequence[int] = (60, 80),
                   steps_per_epoch: int = 1,
                   weight_decay: float = 0.0,
                   max_grad_norm: Optional[float] = None,
                   gamma: float = 0.1,
                   mu_dtype: Optional[str] = None
                   ) -> optax.GradientTransformation:
    """``mu_dtype`` (e.g. ``"bfloat16"``) stores AdamW's FIRST moment in a
    reduced dtype — 4 bytes/param less HBM (0.9 GB on the 220M dual
    encoder), freeing activation headroom on the memory-bound 16f
    fine-tune.  The moment is upcast for the update, so only its storage
    rounds; the variance (which controls the step SIZE via rsqrt) stays
    f32.  Beyond the reference (torch AdamW is f32-only); off by default.
    """
    schedule = make_step_lr(base_lr, milestones, steps_per_epoch, gamma)
    tx = optax.adamw(schedule, weight_decay=weight_decay, eps=1e-6,
                     mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def create_train_state(model, params, tx) -> TrainState:
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
