"""Cross-entropy for the OSCC / PNR classification heads.

Behavioral reference: /root/reference/model/loss.py:135-141 (torch
``nn.CrossEntropyLoss`` = mean softmax cross-entropy over integer targets).
OSCC uses 2 logits (state change yes/no); PNR uses 16 logits over sampled
frames with the argmax of the one-hot keyframe label as target
(trainer_pnr.py:339-350).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean softmax cross entropy; ``targets`` are integer class ids [B]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None].astype(jnp.int32), axis=1)
    return nll.mean()
