"""Mesh collectives for global-batch contrastive training.

The reference implements a differentiable all-gather by hand
(`AllGather_multi`, /root/reference/trainer/trainer_egoclip.py:11-27):
forward = NCCL all_gather + concat, backward = slice out the local shard.
Combined with DDP gradient averaging that yields the gradient of the
global-batch loss.

On TPU there are two idiomatic ways to get the same math; both are here:

1. *Implicit* (preferred): compute embeddings under ``jax.jit`` with the
   batch sharded over the ``data`` mesh axis and just write
   ``sim = text @ video.T``.  XLA inserts the all-gather on ICI and the
   psum in the backward pass automatically.  Nothing to call.

2. *Explicit* (`all_gather_from_data_axis`): inside ``shard_map``-regions a
   literal ``jax.lax.all_gather`` over the ``data`` axis.  JAX's all_gather
   is differentiable with exactly the reference's slice semantics.

`chunked_global_similarity` additionally provides a memory-lean variant that
never materializes the full (global x global) similarity matrix gradient on
one chip — useful once global batches grow into the tens of thousands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egovlp_tpu.core.mesh import DATA_AXIS


def all_gather_from_data_axis(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """Differentiable all-gather along the batch axis (use under shard_map).

    Equivalent contract to the reference `AllGather_multi.apply`
    (/root/reference/trainer/trainer_egoclip.py:11-27): output is the
    concatenation of every rank's shard along axis 0.
    """
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def psum_scalar(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    return jax.lax.psum(x, axis_name)


def pmean_scalar(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    return jax.lax.pmean(x, axis_name)


def chunked_global_similarity(local_a: jax.Array, local_b: jax.Array,
                              axis_name: str = DATA_AXIS) -> jax.Array:
    """Local-rows x global-cols similarity via ppermute ring.

    Returns sim[l, G] where l = local batch and G = global batch: each step
    rotates the ``b`` shard one hop around the data-axis ring (pure ICI
    traffic) and fills the matching column block.  The full G x G matrix is
    never resident on a single chip; the caller combines the blocks with a
    row-wise softmax (safe because each rank owns complete rows).
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    l = local_a.shape[0]
    out = jnp.zeros((l, n * l), dtype=local_a.dtype)
    lb = local_b
    for step in range(n):
        owner = (me - step) % n  # rank whose shard lb currently holds
        blk = local_a @ lb.T
        out = jax.lax.dynamic_update_slice(out, blk, (0, owner * l))
        if step != n - 1:
            lb = jax.lax.ppermute(
                lb, axis_name, perm=[(i, (i + 1) % n) for i in range(n)]
            )
    return out
