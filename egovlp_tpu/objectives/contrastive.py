"""Contrastive objectives: InfoNCE (NormSoftmax) and EgoNCE.

Pure functions over the (global-batch) similarity matrix; they run inside
jit, so when the batch is sharded over the ``data`` mesh axis the backward
pass of the gathered matmul is handled by XLA collectives.

Behavioral reference: /root/reference/model/loss.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def info_nce(sim: jax.Array, temperature: float = 0.05) -> jax.Array:
    """Symmetric InfoNCE with diagonal positives (NormSoftmaxLoss,
    loss.py:7-25): ``-mean(diag(logsoftmax(S/t))) - mean(diag(logsoftmax(S.T/t)))``.
    """
    s = sim.astype(jnp.float32) / temperature
    i = jnp.diagonal(jax.nn.log_softmax(s, axis=1))
    j = jnp.diagonal(jax.nn.log_softmax(s.T, axis=1))
    return -(i.mean() + j.mean())


def egonce(
    sim: jax.Array,
    mask_v: jax.Array,
    mask_n: jax.Array,
    temperature: float = 0.05,
    noun: bool = True,
    verb: bool = True,
) -> jax.Array:
    """EgoNCE (loss.py:27-53): action-aware positives.

    Positives for row i are samples sharing BOTH a verb and a noun synonym
    class (``mask_v * mask_n``) plus the diagonal.  The per-row loss is the
    log of the positive softmax mass: ``log(sum_{j in pos} softmax(S/t)_ij)``,
    applied in both directions.

    mask_v / mask_n: [N, N] 0/1 matrices (typically ``verb_onehots @
    verb_onehots.T > 0`` from the gathered one-hot vectors, cf.
    trainer_egoclip.py:132-135).
    """
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=sim.dtype)
    if noun and verb:
        mask = mask_v * mask_n + eye
    elif noun:
        mask = mask_n + eye
    else:
        mask = mask_v + eye
    mask = (mask > 0).astype(jnp.float32)

    s = sim.astype(jnp.float32) / temperature
    # log of masked softmax mass == logsumexp(masked) - logsumexp(all);
    # computed in log-space for stability (the reference multiplies the
    # probabilities directly, loss.py:44-52 — same value, worse conditioning).
    def direction(logits, m):
        log_pos = jax.nn.logsumexp(logits, axis=1, b=m)
        log_all = jax.nn.logsumexp(logits, axis=1)
        return (log_pos - log_all).mean()

    return -(direction(s, mask) + direction(s.T, mask.T))
