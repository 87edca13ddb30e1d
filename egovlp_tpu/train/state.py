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


def adamw_reference(learning_rate, b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-6, weight_decay: float = 0.0,
                    mu_dtype=None) -> optax.GradientTransformation:
    """``transformers.AdamW`` (the reference's actual optimizer,
    run/train_egoclip.py:72-73) as an optax transformation — exact to its
    update rule rather than optax.adamw's:

      * eps is added to ``sqrt(nu)`` BEFORE bias correction (optax adds it
        to ``sqrt(nu_hat)``), so the effective epsilon differs by a factor
        ``sqrt(1 - b2^t)`` — ~32x at step 1.  Leaves whose gradient scale
        is near eps take visibly different first steps under the two
        rules; for bit-careful trajectory parity with torch this is the
        one to use.
      * decoupled weight decay is applied AFTER the Adam step, on the
        UPDATED parameter (optax folds ``wd * p_old`` into the same
        update) — O(lr^2·wd) per-step difference.

    With ``weight_decay=0`` (the shipped configs) only the eps placement
    differs.  ``learning_rate`` may be a schedule or a float."""
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype else None

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_reference requires params")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        t = count.astype(jnp.float32)
        step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)

        def upd(g, m, v, p):
            g32 = g.astype(jnp.float32)
            m32 = m.astype(jnp.float32) * b1 + (1.0 - b1) * g32
            v = v * b2 + (1.0 - b2) * g32 * g32
            delta = -step_size * m32 / (jnp.sqrt(v) + eps)
            if weight_decay:
                delta = delta - lr * weight_decay * (p + delta)
            return delta.astype(p.dtype), m32.astype(m.dtype), v

        out = jax.tree_util.tree_map(upd, grads, state.mu, state.nu, params)
        updates = jax.tree_util.tree_map(lambda o: o[0], out,
                                         is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda o: o[1], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda o: o[2], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def adamw_fused(learning_rate, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-6, weight_decay: float = 0.0,
                mu_dtype=None) -> optax.GradientTransformation:
    """``optax.adamw``'s exact update rule (eps on ``sqrt(nu_hat)``,
    decay folded into the pre-LR update) computed in ONE tree pass, so
    every leaf's mu/nu/delta math reaches XLA as a single producer chain
    instead of optax's chained per-transform passes.  Numerically
    equivalent to ``optax.adamw`` (tested leafwise over a 5-step
    trajectory); exists to measure whether the chain structure costs
    anything on TPU — see scripts/opt_tail_ab.py."""
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype else None

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_fused requires params")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t

        def upd(g, m, v, p):
            g32 = g.astype(jnp.float32)
            m32 = m.astype(jnp.float32) * b1 + (1.0 - b1) * g32
            v = v * b2 + (1.0 - b2) * g32 * g32
            u = (m32 / bc1) / (jnp.sqrt(v / bc2) + eps)
            if weight_decay:
                u = u + weight_decay * p
            return (-lr * u).astype(p.dtype), m32.astype(m.dtype), v

        out = jax.tree_util.tree_map(upd, grads, state.mu, state.nu, params)
        leaf = lambda x: isinstance(x, tuple)
        updates = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=leaf)
        mu = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=leaf)
        nu = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=leaf)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(base_lr: float = 3e-5,
                   milestones: Sequence[int] = (60, 80),
                   steps_per_epoch: int = 1,
                   weight_decay: float = 0.0,
                   max_grad_norm: Optional[float] = None,
                   gamma: float = 0.1,
                   mu_dtype: Optional[str] = None,
                   variant: str = "optax",
                   ) -> optax.GradientTransformation:
    """``mu_dtype`` (e.g. ``"bfloat16"``) stores AdamW's FIRST moment in a
    reduced dtype — 4 bytes/param less HBM (0.9 GB on the 220M dual
    encoder), freeing activation headroom on the memory-bound 16f
    fine-tune.  The moment is upcast for the update, so only its storage
    rounds; the variance (which controls the step SIZE via rsqrt) stays
    f32.  Beyond the reference (torch AdamW is f32-only); off by default.

    ``variant``: 'optax' (default) uses optax.adamw; 'reference' uses
    :func:`adamw_reference` — bit-careful ``transformers.AdamW`` update
    semantics; 'fused' uses :func:`adamw_fused` — optax.adamw math in one
    tree pass (config key ``optimizer.args.variant``)."""
    schedule = make_step_lr(base_lr, milestones, steps_per_epoch, gamma)
    if variant == "reference":
        tx = adamw_reference(schedule, weight_decay=weight_decay, eps=1e-6,
                             mu_dtype=mu_dtype)
    elif variant == "fused":
        tx = adamw_fused(schedule, weight_decay=weight_decay, eps=1e-6,
                         mu_dtype=mu_dtype)
    elif variant == "optax":
        tx = optax.adamw(schedule, weight_decay=weight_decay, eps=1e-6,
                         mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None)
    else:
        raise ValueError(f"optimizer variant {variant!r}: expected "
                         "'optax', 'reference', or 'fused'")
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def create_train_state(model, params, tx) -> TrainState:
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
