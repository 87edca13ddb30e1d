"""Cross-process gathering for distributed evaluation.

The reference all-gathers per-rank eval predictions/embeddings before
computing metrics (`/root/reference/trainer/trainer_egoclip.py:224-234`,
`trainer_epic.py:211-225`, `trainer_pnr.py:449-455`).  This module is the
TPU-native counterpart for this repo's per-process sharded eval loaders
(train/build.py shards val/test by ``jax.process_index()``): each process
evaluates its shard, then `gather_eval` concatenates every process's
arrays (host-side, via `multihost_utils.process_allgather` on CPU-backed
arrays) and drops the DistributedSampler-style pad duplicates using the
per-item dataset indices the Loader attaches to every batch (`_index`).

The result on EVERY process is the full-dataset arrays in dataset order —
so metrics (and the monitored early-stopping metric) are identical across
hosts and equal to a single-process evaluation.

Single-process calls are exact no-ops (beyond the pad-dedup, which is
also a no-op because a 1-shard loader never pads).
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np


def _process_count() -> int:
    import jax

    return jax.process_count()


def _gather_counts(n_local: int) -> np.ndarray:
    """Per-process leading lengths, one int exchange."""
    import jax
    from jax.experimental import multihost_utils

    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([n_local], np.int64)))
    return counts.reshape(jax.process_count())


def _allgather_padded(x: np.ndarray,
                      counts: Optional[np.ndarray] = None
                      ) -> List[np.ndarray]:
    """All-gather a per-process numpy array of process-dependent leading
    length; returns the per-process arrays (trimmed to true lengths).
    ``counts`` (from `_gather_counts`) may be shared across calls — the
    eval gathers many same-length columns with ONE length exchange."""
    import jax
    from jax.experimental import multihost_utils

    # process_allgather needs identical shapes: pad to the max, gather, trim
    if counts is None:
        counts = _gather_counts(x.shape[0])
    n_max = int(counts.max())
    if x.shape[0] < n_max:
        pad = np.zeros((n_max - x.shape[0],) + x.shape[1:], x.dtype)
        x = np.concatenate([x, pad])
    gathered = np.asarray(multihost_utils.process_allgather(x))
    gathered = gathered.reshape((jax.process_count(), n_max) + x.shape[1:])
    return [gathered[p, : counts[p]] for p in range(len(counts))]


def gather_arrays(arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Concatenate per-process eval arrays across all processes (axis 0).

    Every value must have the same local leading length; lengths may
    differ between processes (unequal shards).  Identity when running
    single-process."""
    if _process_count() == 1:
        return arrays
    counts = None
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        if counts is None:
            counts = _gather_counts(v.shape[0])
        out[k] = np.concatenate(_allgather_padded(v, counts))
    return out


def gather_objects(objs: Sequence) -> List:
    """Concatenate per-process python lists (paths, captions) across
    processes, same order as `gather_arrays` rows (process-major)."""
    if _process_count() == 1:
        return list(objs)
    raw = np.frombuffer(pickle.dumps(list(objs)), np.uint8)
    parts = _allgather_padded(raw[:, None])
    out: List = []
    for p in parts:
        out.extend(pickle.loads(p[:, 0].tobytes()))
    return out


def dedupe_order(index: np.ndarray) -> np.ndarray:
    """Row selection that (a) drops pad duplicates (shard_indices pads the
    last ranks with head items when the dataset doesn't divide evenly) and
    (b) restores dataset order.  Returns positions into the gathered rows.
    """
    index = np.asarray(index)
    # np.unique returns values ascending with the FIRST occurrence of
    # each — exactly dataset order with pads dropped
    _, first = np.unique(index, return_index=True)
    return first


def gather_eval(arrays: Dict[str, np.ndarray],
                index: Optional[np.ndarray] = None,
                objects: Optional[Dict[str, Sequence]] = None):
    """One-call distributed-eval gather.

    Args:
      arrays: per-process {name: [n_local, ...]} numpy arrays.
      index: per-process [n_local] global dataset indices (the Loader's
        ``_index``); enables pad-dedup + dataset-order restoration.
      objects: optional {name: list} python-object columns (paths, texts)
        gathered alongside and re-ordered identically.

    Returns (arrays, objects) with full-dataset rows on every process;
    ``objects`` is None when not supplied.
    """
    if index is not None:
        arrays = dict(arrays)
        arrays["__idx"] = np.asarray(index)
    g = gather_arrays(arrays)
    gobj = ({k: gather_objects(v) for k, v in objects.items()}
            if objects is not None else None)
    if index is not None:
        sel = dedupe_order(g.pop("__idx"))
        g = {k: v[sel] for k, v in g.items()}
        if gobj is not None:
            gobj = {k: [v[i] for i in sel] for k, v in gobj.items()}
    return g, gobj
