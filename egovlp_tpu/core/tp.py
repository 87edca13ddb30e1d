"""Tensor parallelism over the mesh ``model`` axis.

The reference scales with data-parallel DDP only (SURVEY.md §2.7); the
220M-param dual encoder fits per-chip, so the ``model`` axis is an
OPTIONAL second mesh dimension for larger derivatives / activation-heavy
fine-tunes.  Sharding is declarative: name-based PartitionSpec rules over
the param tree, applied with ``jax.device_put``; GSPMD then inserts the
collectives inside the jitted step (no hand-written comm, the TPU-native
counterpart of Megatron layer splitting).

Rules (Megatron-style column->row pairs, boundaries head-aligned):

  text tower   q_lin/k_lin/v_lin  column-parallel (output dim sharded)
               out_lin            row-parallel    (input dim sharded)
               ffn_lin1 / _lin2   column / row
  video tower  mlp fc1 / fc2      column / row
               attn/timeattn qkv  column-parallel (fused [q|k|v] output
               dim sharded contiguously; the timm layout means a 2-way
               split lands mid-q/k/v, which is semantically safe under
               GSPMD — it re-partitions at FusedQKVProj's kernel slices
               `k[:, i*D:(i+1)*D]` (models/video_tower.py) — though not
               head-interleaved; the largest attention param/compute
               share now really splits across the model axis)
               attn/timeattn proj row-parallel

Everything else (embeddings, layernorms, projections, cls/pos tokens) is
replicated.  The same name rules apply to the optimizer state: Adam's
mu/nu mirror the param tree, so their paths contain the same module
names.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egovlp_tpu.core.mesh import MODEL_AXIS

_COLUMN = ("fc1", "ffn_lin1", "q_lin", "k_lin", "v_lin", "qkv")
_ROW = ("fc2", "ffn_lin2", "out_lin", "proj")


def _path_names(path) -> list:
    out = []
    for p in path:
        out.append(getattr(p, "key", getattr(p, "name", str(p))))
    return out


def _spec_for(names, shape, n_model: int) -> P:
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) > 1 else ""
    if parent in _COLUMN:
        if leaf == "kernel" and len(shape) == 2 and shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if leaf == "bias" and len(shape) == 1 and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
    if parent in _ROW:
        if leaf == "kernel" and len(shape) == 2 and shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
        # row-parallel bias is added after the psum -> replicated
    return P()


def tp_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for ``tree`` (params, or a whole TrainState —
    optimizer moments mirror the param names) under ``mesh``'s model axis.
    Dims that don't divide the axis size stay replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        shape = np.shape(leaf)
        if n_model <= 1 or not shape:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(_path_names(path), shape,
                                             n_model))

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_state_tp(state, mesh: Mesh):
    """device_put a TrainState with tensor-parallel param/moment shardings
    (replicated scalars)."""
    return jax.device_put(state, tp_shardings(state, mesh))
