"""Memory-lean global-batch contrastive losses over a ppermute ring.

The default EgoClip step computes ``sim_matrix(t, v)`` on logically-global
embeddings and lets GSPMD all-gather — which materializes the full
``[G, G]`` similarity (and its gradient) on every chip.  At pod-scale
global batches (tens of thousands) that matrix dominates memory.  This
module provides the ring formulation (VERDICT r2 item 8): inside
``jax.shard_map`` over the ``data`` axis, each chip owns its ``[l, G]``
row block built by rotating the opposite-side shard around the ring
(`core.collectives.chunked_global_similarity` — pure ICI traffic), so no
``[G, G]`` tensor ever lives on one chip.  Each loss direction is a
row-wise reduction, so complete rows are all a chip needs; the global mean
is one ``pmean``.

Selected from config via ``loss.args.global_sim: "ring"`` (default
``"gather"``); equality with the gathered formulation is mesh-tested.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egovlp_tpu.core.collectives import chunked_global_similarity
from egovlp_tpu.core.mesh import DATA_AXIS


def _normalize(x, eps=1e-8):
    # matches models.dual_encoder.sim_matrix's eps-clamped cosine
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=1, keepdims=True)
    return x.astype(jnp.float32) / jnp.maximum(n, eps)


def _row_direction_egonce(rows, mask_rows, temperature):
    s = rows / temperature
    log_pos = jax.nn.logsumexp(s, axis=1, b=mask_rows)
    log_all = jax.nn.logsumexp(s, axis=1)
    return (log_pos - log_all).mean()


def _row_direction_infonce(rows, diag_cols, temperature):
    s = rows / temperature
    logp = jax.nn.log_softmax(s, axis=1)
    return jnp.take_along_axis(logp, diag_cols[:, None], axis=1).mean()


def egoclip_ring_loss(t, v, noun_vec, verb_vec, *, loss_type: str,
                      temperature: float = 0.05, noun: bool = True,
                      verb: bool = True, axis_name: str = DATA_AXIS):
    """shard_map body: all inputs are LOCAL shards ([l, ...]).

    Returns the replicated global-batch loss — identical to
    ``egonce(sim_matrix(t, v), ...)`` / ``info_nce`` on the gathered
    batch (objectives/contrastive.py), without a resident [G, G]."""
    l = t.shape[0]
    me = jax.lax.axis_index(axis_name)
    offs = me * l + jnp.arange(l)  # global row ids of this shard

    tn, vn = _normalize(t), _normalize(v)
    rows_t2v = chunked_global_similarity(tn, vn, axis_name)  # [l, G]
    rows_v2t = chunked_global_similarity(vn, tn, axis_name)  # [l, G]
    G = rows_t2v.shape[1]

    if loss_type == "EgoNCE":
        # positives share BOTH a verb and a noun class, plus the diagonal
        # (trainer_egoclip.py:132-135); the mask is symmetric, so both
        # directions use the same row formula.  One-hot gathers are tiny
        # ([G, 582]/[G, 118]) — no [G, G] is built.
        gnv = jax.lax.all_gather(noun_vec, axis_name, axis=0, tiled=True)
        gvv = jax.lax.all_gather(verb_vec, axis_name, axis=0, tiled=True)
        pos = (noun_vec @ gnv.T) * (verb_vec @ gvv.T)
        diag = (offs[:, None] == jnp.arange(G)[None, :])
        mask_rows = ((pos > 0) | diag).astype(jnp.float32)
        if not (noun and verb):
            single = noun_vec @ gnv.T if noun else verb_vec @ gvv.T
            mask_rows = ((single > 0) | diag).astype(jnp.float32)
        d1 = _row_direction_egonce(rows_t2v, mask_rows, temperature)
        d2 = _row_direction_egonce(rows_v2t, mask_rows, temperature)
    else:  # InfoNCE / NormSoftmax: diagonal positives
        d1 = _row_direction_infonce(rows_t2v, offs, temperature)
        d2 = _row_direction_infonce(rows_v2t, offs, temperature)
    return -jax.lax.pmean(d1 + d2, axis_name)
