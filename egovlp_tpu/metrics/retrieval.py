"""Text<->video retrieval metrics (R@k, MedR, MeanR).

Protocol-compatible with the reference `t2v_metrics` / `v2t_metrics`
(/root/reference/model/metric.py:20-216): ranks are derived by distance
subtraction against the sorted row (deterministic under ties), t2v breaks
ties optimistically, v2t rank-averages ties and takes the closest relevant
caption when a video has several.  Note the reference's final
``cols2metrics`` helper is *missing* from the repo (latent NameError, dead
code path) — the summary computed here follows the Frozen-in-Time protocol
the function descends from: R@1/5/10/50 (percent), MedR, MeanR.
"""

from __future__ import annotations

import numpy as np


def _summarize(ranks: np.ndarray, num_queries: int) -> dict:
    ranks = np.asarray(ranks, np.float64)
    out = {
        "R1": 100 * float(np.mean(ranks == 0)),
        "R5": 100 * float(np.mean(ranks < 5)),
        "R10": 100 * float(np.mean(ranks < 10)),
        "R50": 100 * float(np.mean(ranks < 50)),
        "MedR": float(np.median(ranks)) + 1.0,
        "MeanR": float(np.mean(ranks)) + 1.0,
    }
    out["geometric_mean_R1-R5-R10"] = float(
        np.exp(np.mean(np.log([max(out["R1"], 1e-12),
                               max(out["R5"], 1e-12),
                               max(out["R10"], 1e-12)])))
    )
    return out


def t2v_metrics(sims: np.ndarray, query_masks: np.ndarray | None = None) -> dict:
    """sims: [num_texts, num_videos]; texts are grouped per video
    (queries_per_video = num_texts // num_videos)."""
    sims = np.asarray(sims)
    assert sims.ndim == 2
    num_queries, num_vids = sims.shape
    dists = -sims
    sorted_dists = np.sort(dists, axis=1)

    queries_per_video = num_queries // num_vids
    # ground-truth distance of query i is dists[i, i // qpv]
    gt_cols = np.repeat(np.arange(num_vids), queries_per_video)
    gt_dists = dists[np.arange(num_queries), gt_cols][:, None]

    rows, cols = np.where(sorted_dists - gt_dists == 0)
    if rows.size > num_queries:  # ties: break optimistically (first match)
        _, first = np.unique(rows, return_index=True)
        cols = cols[first]
    assert cols.size == num_queries

    if query_masks is not None:
        keep = query_masks.reshape(-1).astype(bool)
        cols = cols[keep]
        num_queries = int(keep.sum())
    return _summarize(cols, num_queries)


def v2t_metrics(sims: np.ndarray, query_masks: np.ndarray | None = None) -> dict:
    """sims: [num_texts, num_videos]; transposed internally.  For each video
    the rank of its *closest* ground-truth caption counts; ties are
    rank-averaged (metric.py:157-190)."""
    sims = np.asarray(sims).T
    num_queries, num_caps = sims.shape
    dists = -sims
    caps_per_video = num_caps // num_queries
    MISSING = 1e8

    ranks = []
    for i in range(num_queries):
        row = dists[i].copy()
        if query_masks is not None:
            row[~query_masks.reshape(-1).astype(bool)] = MISSING
        srt = np.sort(row)
        best = np.inf
        for j in range(i * caps_per_video, (i + 1) * caps_per_video):
            if row[j] == MISSING:
                continue
            tied = np.where(srt - row[j] == 0)[0]
            best = min(best, float(tied.mean()))
        ranks.append(best)
    return _summarize(np.asarray(ranks), num_queries)
