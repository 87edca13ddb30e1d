"""Jitted task step functions.

Each factory returns a jit-compiled ``step(state, batch, rng)`` fusing the
on-device video transform, the dual-encoder forward, the global-batch loss
and the optimizer update into one XLA program.  Batches arrive sharded over
the ``data`` mesh axis and parameters replicated; XLA inserts the
embedding all-gather (for the sim matrix) and the gradient psum — the
semantics the reference builds by hand from `AllGather_multi` + DDP
(SURVEY.md §2.7).

Behavioral references per task: trainer_egoclip.py:82-180 (EgoNCE over
gathered embeddings with verb/noun cosine masks), trainer_epic.py:110-135,
trainer_charades.py:110-130, trainer_oscc.py:325-345,
trainer_pnr.py:325-352.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from egovlp_tpu.core.mesh import DATA_AXIS
from egovlp_tpu.data.transforms import eval_resize, random_resized_crop_flip
from egovlp_tpu.models.dual_encoder import sim_matrix
from egovlp_tpu.objectives import (
    adaptive_max_margin,
    cross_entropy,
    egonce,
    info_nce,
    max_margin,
)


def numeric_batch(batch: dict) -> dict:
    """Strip non-array leaves (raw caption strings, metadata dicts) so the
    batch is a valid jit argument; keeps numpy/jax arrays and scalars."""
    import numpy as np

    def ok(v):
        return isinstance(v, (jnp.ndarray, np.ndarray)) or np.isscalar(v)

    # underscore keys are host-side metadata (e.g. the Loader's ``_index``
    # used by the distributed-eval gather) — never jit arguments
    return {k: v for k, v in batch.items()
            if ok(v) and not isinstance(v, str) and not k.startswith("_")}


def arrays_only(step_fn: Callable) -> Callable:
    """Wrap a jitted step so callers can pass raw collated batches.  The
    underlying jitted function stays reachable as ``.jitted`` (for
    .lower()/cost_analysis introspection, e.g. bench.py's MFU line)."""
    def wrapped(state, batch, rng):
        return step_fn(state, numeric_batch(batch), rng)

    wrapped.jitted = step_fn
    return wrapped


def _transform_train(rng, frames, res):
    return random_resized_crop_flip(rng, frames, out_size=res)


def _transform_eval(frames, res):
    return eval_resize(frames, out_size=res)


# --------------------------------------------------------------------------
# EgoClip pretraining (EgoNCE / InfoNCE)
# --------------------------------------------------------------------------

def _step_jit(donate: bool):
    """jit decorator for ``step(state, batch, rng)`` functions.

    ``donate=True`` donates the train state (params + optimizer state):
    XLA reuses those buffers for the updated state instead of allocating
    a second copy — ~2x(params+opt) less peak HBM (~2.6 GB for the
    ViT-B/DistilBERT flagship with f32 AdamW) plus the saved copy
    traffic.  The production trainer path enables it (the epoch loop
    always rebinds ``state``); factories default to False because A/B
    and parity tests intentionally reuse ONE initial state across
    several step variants, which donation would invalidate.
    """
    return functools.partial(jax.jit, donate_argnums=(0,) if donate else ())


def make_egoclip_train_step(loss_type: str = "EgoNCE", input_res: int = 224,
                            temperature: float = 0.05, noun: bool = True,
                            verb: bool = True, global_sim: str = "gather",
                            donate: bool = False, n_micro: int = 1):
    """``global_sim``: 'gather' (default) computes the full similarity on
    logically-global embeddings (GSPMD all-gathers; the reference's
    AllGather_multi semantics); 'ring' keeps only [local, G] row blocks
    per chip via a shard_map'd ppermute ring (objectives/ring.py) — same
    loss, O(G^2/n_chips) less resident memory at pod-scale batches.
    'ring' falls back to 'gather' when no data-axis mesh is active.

    ``n_micro > 1`` (config ``trainer.grad_accum``): exact GradCache
    two-pass gradient accumulation (train/grad_cache.py) — same loss and
    gradients as the monolithic step, tower activations for only B/K
    samples resident.  The post-negative-concat batch must divide by it.
    """
    if n_micro > 1 and global_sim == "ring":
        raise ValueError("grad_accum composes with global_sim='gather' "
                         "only (the ring loss already bounds memory)")

    @_step_jit(donate)
    def step(state, batch, rng):
        frames = batch["frames"]
        ids = batch["text_ids"]
        mask = batch["text_mask"]
        noun_vec = batch["noun_vec"]
        verb_vec = batch["verb_vec"]
        if "frames_neg" in batch:
            # scene-aware negatives double the batch (trainer :109-113)
            frames = jnp.concatenate([frames, batch["frames_neg"]], 0)
            ids = jnp.concatenate([ids, batch["text_neg_ids"]], 0)
            mask = jnp.concatenate([mask, batch["text_neg_mask"]], 0)
            noun_vec = jnp.concatenate([noun_vec, batch["noun_vec_neg"]], 0)
            verb_vec = jnp.concatenate([verb_vec, batch["verb_vec_neg"]], 0)

        t_rng, d_rng = jax.random.split(rng)
        video = _transform_train(t_rng, frames, input_res)

        if n_micro > 1:
            from egovlp_tpu.train.grad_cache import grad_cache_value_and_grad

            def embed_fn(params, mb, key):
                return state.apply_fn(
                    {"params": params}, mb["video"], mb["ids"], mb["mask"],
                    deterministic=False, rngs={"dropout": key},
                )

            def emb_loss(emb):
                t, v = emb
                sim = sim_matrix(t, v)
                if loss_type == "EgoNCE":
                    # the verb/noun mask matrices come from batch INPUTS
                    # (not embeddings), so they are available in full here
                    return egonce(sim, sim_matrix(verb_vec, verb_vec),
                                  sim_matrix(noun_vec, noun_vec),
                                  temperature, noun=noun, verb=verb)
                return info_nce(sim, temperature)

            vg = grad_cache_value_and_grad(embed_fn, emb_loss, n_micro)
            loss, grads = vg(state.params,
                             {"video": video, "ids": ids, "mask": mask},
                             d_rng)
            return state.apply_gradients(grads=grads), loss

        def loss_fn(params):
            t, v = state.apply_fn(
                {"params": params}, video, ids, mask, deterministic=False,
                rngs={"dropout": d_rng},
            )
            from egovlp_tpu.core.mesh import current_mesh

            mesh = current_mesh()  # not get_abstract_mesh (empty
            # under the `with mesh:` context the trainer uses)
            if (global_sim == "ring" and mesh is not None
                    and DATA_AXIS in getattr(mesh, "shape", {})):
                from jax.sharding import PartitionSpec as P

                from egovlp_tpu.objectives.ring import egoclip_ring_loss

                body = functools.partial(
                    egoclip_ring_loss, loss_type=loss_type,
                    temperature=temperature, noun=noun, verb=verb,
                    axis_name=DATA_AXIS)
                return jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P(DATA_AXIS),) * 4, out_specs=P(),
                    check_vma=False,
                )(t, v, noun_vec, verb_vec)
            sim = sim_matrix(t, v)
            if loss_type == "EgoNCE":
                sim_v = sim_matrix(verb_vec, verb_vec)
                sim_n = sim_matrix(noun_vec, noun_vec)
                return egonce(sim, sim_v, sim_n, temperature, noun=noun,
                              verb=verb)
            return info_nce(sim, temperature)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return arrays_only(step)


# --------------------------------------------------------------------------
# EPIC-Kitchens MIR fine-tuning (MaxMargin / Adaptive MI-MM)
# --------------------------------------------------------------------------

def make_epic_train_step(loss_type: str = "MaxMarginRankingLoss",
                         input_res: int = 224, margin: float = 0.2,
                         fix_norm: bool = True, donate: bool = False):
    @_step_jit(donate)
    def step(state, batch, rng):
        t_rng, d_rng = jax.random.split(rng)
        video = _transform_train(t_rng, batch["frames"], input_res)

        def loss_fn(params):
            t, v = state.apply_fn(
                {"params": params}, video, batch["text_ids"],
                batch["text_mask"], deterministic=False,
                rngs={"dropout": d_rng},
            )
            sim = sim_matrix(t, v)
            if loss_type == "AdaptiveMaxMarginRankingLoss":
                return adaptive_max_margin(sim, batch["relation"],
                                           margin=margin, fix_norm=fix_norm)
            return max_margin(sim, margin=margin, fix_norm=fix_norm)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return arrays_only(step)


# --------------------------------------------------------------------------
# CharadesEgo fine-tuning (InfoNCE)
# --------------------------------------------------------------------------

def make_charades_train_step(input_res: int = 224, temperature: float = 0.05,
                             donate: bool = False):
    @_step_jit(donate)
    def step(state, batch, rng):
        t_rng, d_rng = jax.random.split(rng)
        video = _transform_train(t_rng, batch["frames"], input_res)

        def loss_fn(params):
            t, v = state.apply_fn(
                {"params": params}, video, batch["text_ids"],
                batch["text_mask"], deterministic=False,
                rngs={"dropout": d_rng},
            )
            return info_nce(sim_matrix(t, v), temperature)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return arrays_only(step)


# --------------------------------------------------------------------------
# Ego4D OSCC / PNR (video-only classification heads)
# --------------------------------------------------------------------------

def make_oscc_train_step(input_res: int = 224, donate: bool = False):
    @_step_jit(donate)
    def step(state, batch, rng):
        t_rng, d_rng = jax.random.split(rng)
        video = _transform_train(t_rng, batch["frames"], input_res)

        def loss_fn(params):
            logits = state.apply_fn(
                {"params": params}, video, method="encode_video",
                deterministic=False, rngs={"dropout": d_rng},
            )
            return cross_entropy(logits, batch["state"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return arrays_only(step)


def make_pnr_train_step(input_res: int = 224, donate: bool = False):
    @_step_jit(donate)
    def step(state, batch, rng):
        t_rng, d_rng = jax.random.split(rng)
        video = _transform_train(t_rng, batch["frames"], input_res)
        targets = jnp.argmax(batch["labels"], axis=1)
        state_mask = batch["state"].astype(jnp.float32)

        def loss_fn(params):
            logits = state.apply_fn(
                {"params": params}, video, method="encode_video",
                deterministic=False, rngs={"dropout": d_rng},
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
            # per-sample CE masked by the state-change flag
            # (trainer_pnr.py:348-350; the PNR dataset is SC-only so the
            # mask is all-ones there)
            return jnp.sum(nll * state_mask) / jnp.maximum(
                jnp.sum(state_mask), 1.0
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return arrays_only(step)


# --------------------------------------------------------------------------
# shared eval embedding steps
# --------------------------------------------------------------------------

def make_embed_step(input_res: int = 224):
    """Eval-transform + dual-encoder forward -> (text_emb, video_emb)."""
    @functools.partial(jax.jit, static_argnums=(0,))
    def embed(apply_fn, params, frames, ids, mask):
        video = _transform_eval(frames, input_res)
        return apply_fn({"params": params}, video, ids, mask,
                        deterministic=True)

    return embed


def make_video_embed_step(input_res: int = 224):
    @functools.partial(jax.jit, static_argnums=(0,))
    def embed(apply_fn, params, frames):
        video = _transform_eval(frames, input_res)
        return apply_fn({"params": params}, video, method="encode_video",
                        deterministic=True)

    return embed


def make_text_embed_step():
    @functools.partial(jax.jit, static_argnums=(0,))
    def embed(apply_fn, params, ids, mask):
        return apply_fn({"params": params}, ids, mask, method="encode_text",
                        deterministic=True)

    return embed
