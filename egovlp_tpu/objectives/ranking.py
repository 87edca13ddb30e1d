"""Max-margin ranking objectives (EPIC-Kitchens MIR fine-tuning).

Behavioral reference: /root/reference/model/loss.py:55-133.  The reference
materializes index-gymnastics tensors; here the same quantity is a closed
form: for every ordered pair (i, j), both retrieval directions contribute
``relu(margin_i - (S_ii - S_ij))`` and ``relu(margin_i - (S_ii - S_ji))``,
averaged over off-diagonal pairs when ``fix_norm`` (the default) strips the
trivially-margin diagonal terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pair_terms(sim: jax.Array, margins: jax.Array):
    d = jnp.diagonal(sim)[:, None]  # S_ii per row
    t2v = jax.nn.relu(margins - (d - sim))
    v2t = jax.nn.relu(margins - (d - sim.T))
    return t2v, v2t


def max_margin(sim: jax.Array, margin: float = 0.2,
               fix_norm: bool = True) -> jax.Array:
    """MaxMarginRankingLoss (loss.py:55-90), margin 0.2 by default."""
    sim = sim.astype(jnp.float32)
    n = sim.shape[0]
    t2v, v2t = _pair_terms(sim, jnp.float32(margin))
    if fix_norm:
        off = 1.0 - jnp.eye(n, dtype=jnp.float32)
        total = jnp.sum(t2v * off) + jnp.sum(v2t * off)
        return total / (2.0 * n * (n - 1))
    return (jnp.sum(t2v) + jnp.sum(v2t)) / (2.0 * n * n)


def adaptive_max_margin(sim: jax.Array, weight: jax.Array,
                        margin: float = 0.4,
                        fix_norm: bool = True) -> jax.Array:
    """AdaptiveMaxMarginRankingLoss (loss.py:92-133, "Adaptive MI-MM").

    ``weight``: per-sample relevancy weight w_i scaling the margin of every
    pair anchored at row i (EPIC EgoVLP+ recipe).
    """
    sim = sim.astype(jnp.float32)
    n = sim.shape[0]
    margins = weight.astype(jnp.float32)[:, None] * margin
    t2v, v2t = _pair_terms(sim, margins)
    if fix_norm:
        off = 1.0 - jnp.eye(n, dtype=jnp.float32)
        total = jnp.sum(t2v * off) + jnp.sum(v2t * off)
        return total / (2.0 * n * (n - 1))
    return (jnp.sum(t2v) + jnp.sum(v2t)) / (2.0 * n * n)
