"""ZeRO-style optimizer-state (and optional parameter) storage sharding.

The reference replicates the full AdamW state on every GPU (plain DDP,
/root/reference/base/base_trainer.py:258 wraps the model in
DistributedDataParallel; torch keeps one optimizer per rank).  On a TPU
pod the same replication wastes ``2 x params x 4B`` of HBM per chip for
the f32 Adam moments — 1.7 GB for the 220M dual encoder, 3.8 GB for the
ViT-L derivative — memory the 16f fine-tune (HBM-bound, docs/ROUND3.md)
would rather spend on activations or batch.

This module is the tpu-native ZeRO: purely DECLARATIVE storage sharding
over the existing ``data`` mesh axis.  No new communication code — the
moments (stage 1) and optionally the parameters (stage 3 storage
semantics) are device_put with data-axis shardings and the jitted train
step is re-pinned with matching ``out_shardings`` so the placement is a
stable fixed point across steps (without the pin GSPMD is free to pick a
different output layout, which would silently re-shard every step).
GSPMD then partitions the Adam update over the data axis and inserts the
reduce-scatter/all-gather pair itself — the same collective schedule
hand-written ZeRO implementations build, derived from shardings instead.

Composition: leaves already sharded over ``model`` by the tensor-parallel
rules (core/tp.py) keep that spec; ZeRO adds the ``data`` axis on the
largest still-replicated dimension that divides it.  Leaves smaller than
``min_size`` elements stay replicated (per-leaf collectives on 768-float
biases cost more than they save).

Config: ``mesh: {"zero": 1}`` shards the optimizer moments,
``{"zero": 3}`` also shards parameter storage (each step all-gathers
params at use — trade HBM for ICI bandwidth; worthwhile only when the
model itself crowds HBM).  Stage 2 (gradient sharding) has no meaning
here: grads are jit-internal temporaries, XLA already materializes only
shards when the consumers (the stage-1 moments) are sharded.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egovlp_tpu.core.mesh import DATA_AXIS

_STATE_FIELDS = {1: ("opt_state",), 3: ("opt_state", "params")}


def _with_data_axis(spec: P, shape, n_data: int) -> P:
    """Insert DATA_AXIS on the largest replicated dim divisible by n_data."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    free = [d for d, e in enumerate(entries)
            if e is None and shape[d] % n_data == 0 and shape[d] >= n_data]
    if not free:
        return spec
    d = max(free, key=lambda i: shape[i])
    entries[d] = DATA_AXIS
    return P(*entries)


def zero_shardings(state, mesh: Mesh, *, stage: int = 1,
                   min_size: int = 16384):
    """NamedSharding pytree for a TrainState under ZeRO ``stage``.

    Starts from the tensor-parallel shardings (identity when the mesh has
    no model axis) and adds DATA_AXIS sharding to every opt_state (stage
    >= 1) / params (stage 3) leaf of at least ``min_size`` elements.
    """
    if stage not in _STATE_FIELDS:
        raise ValueError(f"zero stage must be 1 or 3, got {stage!r}")
    from egovlp_tpu.core.tp import tp_shardings

    base = tp_shardings(state, mesh)
    n_data = mesh.shape[DATA_AXIS]
    fields = _STATE_FIELDS[stage]

    from egovlp_tpu.core.tp import _path_names

    def one(path, leaf, base_sh):
        shape = np.shape(leaf)
        if (n_data <= 1 or not shape
                or _path_names(path[:1])[0] not in fields
                or int(np.prod(shape)) < min_size):
            return base_sh
        return NamedSharding(mesh, _with_data_axis(base_sh.spec, shape,
                                                   n_data))

    return jax.tree_util.tree_map_with_path(one, state, base)


def shard_state_zero(state, mesh: Mesh, *, stage: int = 1,
                     min_size: int = 16384):
    """device_put the TrainState with ZeRO storage shardings."""
    return jax.device_put(state, zero_shardings(state, mesh, stage=stage,
                                                min_size=min_size))


def pin_step_shardings(step_fn, state_shardings):
    """Re-jit a task step (``steps.arrays_only`` wrapper) so the returned
    TrainState keeps the ZeRO layout — a fixed point instead of whatever
    GSPMD's output-sharding search happens to pick each compile.

    The whole state tree is pinned (params keep their tp/replicated
    spec, moments their ZeRO spec); the loss stays unconstrained.
    Without the pin, propagation lets the data-sharded optimizer update
    drift the OUTPUT params to data-sharded — stage 1 would silently
    become stage 3.  Pinning alone is not enough either: it needs
    ``_grad_boundary_tx``'s gradient constraint, otherwise the pinned
    specs collide with the moment shardings mid-backward and the
    partitioner falls back to involuntary full rematerialization of
    per-block activations (observed on the (4, 2) sp dryrun mesh)."""
    from egovlp_tpu.train.steps import arrays_only

    inner = getattr(step_fn, "jitted", step_fn)
    pinned = jax.jit(inner, out_shardings=(state_shardings, None))
    return arrays_only(pinned)


def _grad_boundary_tx(tx, param_shardings):
    """Wrap an optax transformation so incoming gradients are constrained
    to their tensor-parallel (data-free) shardings before the update.

    Without the boundary, GSPMD propagates the data-axis moment shardings
    BACKWARD through the weight-gradient matmuls into the activations —
    on an sp mesh that collides with the token-grid constraints and the
    partitioner falls back to involuntary full rematerialization of
    per-block activations (observed on the (4, 2) dryrun).  Constraining
    the grads to the spec the params already use (replicated on a pure-dp
    mesh) stops the leak at a [D, D']-sized tensor: grads all-reduce as
    in plain dp, the moment update then slices its data shard locally.
    The wrapper reuses ``tx``'s state tree, so checkpoints interoperate
    with ZeRO on or off."""
    import optax

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            jax.lax.with_sharding_constraint, updates, param_shardings)
        return tx.update(updates, state, params)

    return optax.GradientTransformation(tx.init, update)


def apply_zero(step_fn, state, mesh: Mesh, *, stage: int = 1,
               min_size: int = 16384, logger: Optional[Any] = None):
    """Shard ``state`` per ZeRO ``stage`` and pin ``step_fn`` to it.

    Returns ``(step_fn, state)``.  The recipes call this after building
    the task step; see train/recipes.py (``mesh: {"zero": ...}``).
    """
    from egovlp_tpu.core.tp import tp_shardings

    state = state.replace(
        tx=_grad_boundary_tx(state.tx, tp_shardings(state.params, mesh)))
    sh = zero_shardings(state, mesh, stage=stage, min_size=min_size)
    state = jax.device_put(state, sh)
    if logger is not None:
        n_data = mesh.shape[DATA_AXIS]
        def uses_data(spec: P) -> bool:
            return any(e == DATA_AXIS or (isinstance(e, tuple)
                                          and DATA_AXIS in e) for e in spec)

        moved = sum(
            int(np.prod(np.shape(l))) * np.dtype(
                getattr(l, "dtype", np.float32)).itemsize
            for l, s in zip(jax.tree_util.tree_leaves(state),
                            jax.tree_util.tree_leaves(sh))
            if uses_data(s.spec))
        logger.info(
            "ZeRO stage %d over data axis %d: %.2f GB of state sharded "
            "(%.2f GB saved per chip)", stage, n_data, moved / 1e9,
            moved * (1 - 1 / n_data) / 1e9)
    return pin_step_shardings(step_fn, sh), state
