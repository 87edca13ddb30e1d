"""EPIC-Kitchens-100 multi-instance retrieval (MIR) metrics: nDCG + mAP.

Behavioral reference: /root/reference/model/metric.py:236-299.  The
reference hard-codes annotation paths; here the pure computation is
separated from IO:

  * `mir_metrics_from_matrices` — the math: rescale sims to [0, 1],
    reorder rows into dataset order using the gathered sample indices,
    select the sentence-matching columns, then nDCG + mAP in both
    directions against the relevancy matrix.
  * `mir_metrics` — convenience wrapper reading the EPIC annotation CSVs /
    relevancy pickle from a directory (same files the reference expects).
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np

from egovlp_tpu.metrics.map import calculate_mAP
from egovlp_tpu.metrics.ndcg import (
    calculate_IDCG,
    calculate_k_counts,
    calculate_nDCG,
)


def mir_metrics_from_matrices(
    similarity_matrix: np.ndarray,
    idx_arr: np.ndarray,
    video_ids: Sequence,
    text_ids: Sequence,
    relevancy: np.ndarray,
) -> dict:
    """similarity_matrix: [N_text, N_video] (text x video, model order);
    idx_arr: gathered dataset indices of the eval samples (metric.py:273-279);
    video_ids / text_ids: narration ids from EPIC_100_retrieval_test{_sentence}
    csv first columns; relevancy: [N_video, N_sentence] graded matrix."""
    sim = (np.asarray(similarity_matrix) + 1) / 2  # metric.py:264

    video_list = list(video_ids)
    indexes = [video_list.index(t) for t in text_ids if t in video_list]

    idx_list = np.asarray(idx_arr).reshape(-1).tolist()
    order = [idx_list.index(i) for i in range(len(video_list))]
    sim = sim[order, :][:, order]
    sim = sim.T[:, indexes]  # -> [video, sentence]

    metrics = {}
    vis_k = calculate_k_counts(relevancy)
    txt_k = calculate_k_counts(relevancy.T)
    vis_nDCG = calculate_nDCG(sim, relevancy, vis_k,
                              IDCG=calculate_IDCG(relevancy, vis_k))
    txt_nDCG = calculate_nDCG(sim.T, relevancy.T, txt_k,
                              IDCG=calculate_IDCG(relevancy.T, txt_k))
    metrics["nDCG_V2T"] = vis_nDCG * 100
    metrics["nDCG_T2V"] = txt_nDCG * 100
    metrics["nDCG_AVG"] = 50 * (vis_nDCG + txt_nDCG)

    vis_mAP = calculate_mAP(sim, relevancy)
    txt_mAP = calculate_mAP(sim.T, relevancy.T)
    metrics["mAP_V2T"] = vis_mAP * 100
    metrics["mAP_T2V"] = txt_mAP * 100
    metrics["mAP_AVG"] = 50 * (vis_mAP + txt_mAP)
    return metrics


def load_epic_annotations(annotation_dir: str):
    """Read EPIC_100_retrieval_test.csv / ..._sentence.csv / relevancy pkl
    (the layout the reference expects, metric.py:261-283)."""
    import pandas as pd

    video_ids = pd.read_csv(
        os.path.join(annotation_dir, "EPIC_100_retrieval_test.csv")
    ).values[:, 0]
    text_ids = pd.read_csv(
        os.path.join(annotation_dir, "EPIC_100_retrieval_test_sentence.csv")
    ).values[:, 0]
    rel_path = os.path.join(
        annotation_dir, "relevancy",
        "caption_relevancy_EPIC_100_retrieval_test.pkl",
    )
    with open(rel_path, "rb") as f:
        relevancy = pickle.load(f)
    return video_ids, text_ids, relevancy


def mir_metrics(similarity_matrix: np.ndarray, idx_arr: np.ndarray,
                annotation_dir: str) -> dict:
    video_ids, text_ids, relevancy = load_epic_annotations(annotation_dir)
    return mir_metrics_from_matrices(
        similarity_matrix, idx_arr, video_ids, text_ids, relevancy
    )
