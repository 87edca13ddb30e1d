"""Gradient accumulation for GLOBAL-BATCH contrastive losses (GradCache).

Naive gradient accumulation is wrong for EgoNCE/InfoNCE/MaxMargin: the
similarity matrix couples every sample in the batch, so the loss does not
decompose into a sum over micro-batches.  The two-pass GradCache scheme
(Gao et al., "Scaling Deep Contrastive Learning Batch Size under Memory
Limited Setup", 2021) computes the exact full-batch gradient while only
ever holding ONE micro-batch of tower activations:

  pass 1  embed every micro-batch under ``lax.scan`` (forward only — no
          activations survive the scan, just the [B, D] embeddings);
  bridge  differentiate the loss AT THE EMBEDDING LEVEL (cheap: the whole
          sim-matrix graph is tiny next to the towers);
  pass 2  re-run each micro-batch's tower forward under ``jax.vjp`` and
          pull the corresponding embedding cotangents back through it,
          summing parameter gradients across the scan.

Cost: one extra tower forward (the same trade ``jax.checkpoint`` makes);
memory: activations for B/K samples instead of B.  With this, one chip
trains at the reference's 32-GPU global batch (SURVEY.md §6) — or larger —
without sharding anything.

TPU notes: the scan keeps a single compiled tower program (compile time
does not grow with K), shapes stay static, and the accumulated grads are
produced exactly where the optimizer expects them, so it composes with
buffer donation, ZeRO and the dp/tp meshes (micro-split happens on the
already-sharded batch axis).

Config: ``trainer.grad_accum: K`` (egoclip recipe; batch must divide by K
after the scene-negative concat doubles it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def grad_cache_value_and_grad(embed_fn, loss_fn, n_micro: int):
    """Build ``(params, batch, rng) -> (loss, grads)`` for a coupled loss.

    ``embed_fn(params, micro_batch, rng) -> pytree of embeddings`` — the
    expensive, per-sample part (towers).  Leaves must keep the micro-batch
    axis leading.  ``rng`` may be None (passed through).

    ``loss_fn(embeddings) -> scalar`` — the coupling part, applied to the
    embeddings of the FULL batch (micro axes flattened back together in
    order, so row i is sample i of the un-split batch).

    ``batch``: pytree whose leaves are [B, ...] with B % n_micro == 0.
    The gradient equals ``jax.grad`` of the monolithic composition
    (tested to float tolerance).
    """
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")

    def split(tree):
        def one(x):
            if x.shape[0] % n_micro:
                raise ValueError(
                    f"batch axis {x.shape[0]} not divisible by "
                    f"n_micro={n_micro}")
            return x.reshape(n_micro, x.shape[0] // n_micro, *x.shape[1:])

        return jax.tree_util.tree_map(one, tree)

    def vg(params, batch, rng=None):
        micro = split(batch)
        keys = None if rng is None else jax.random.split(rng, n_micro)

        def emb1(_, xs):
            mb, key = xs
            return None, embed_fn(params, mb, key)

        _, embs = lax.scan(emb1, None, (micro, keys))
        flat = jax.tree_util.tree_map(
            lambda e: e.reshape(e.shape[0] * e.shape[1], *e.shape[2:]), embs)
        loss, d_flat = jax.value_and_grad(loss_fn)(flat)
        d_embs = jax.tree_util.tree_map(
            lambda g, e: g.reshape(e.shape), d_flat, embs)

        def acc(g_acc, xs):
            mb, key, ct = xs
            _, pullback = jax.vjp(lambda p: embed_fn(p, mb, key), params)
            g = pullback(ct)[0]
            return jax.tree_util.tree_map(jnp.add, g_acc, g), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, p.dtype), params)
        grads, _ = lax.scan(acc, zeros, (micro, keys, d_embs))
        return loss, grads

    return vg
