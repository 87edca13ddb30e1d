"""EPIC-Kitchens MIR offline evaluation with optional dual-softmax.

Behavioral reference: run/test_epic.py:105-157 — embed the whole test set,
score with either cosine similarity rescaled to [0,1] or the EgoVLP+
dual-softmax (raw dot products -> row softmax at temperature 500 times the
raw matrix -> column softmax), reorder columns by the sentence<->video id
match, then nDCG + mAP against the relevancy matrix.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from egovlp_tpu.metrics.map import calculate_mAP
from egovlp_tpu.metrics.ndcg import (
    calculate_IDCG,
    calculate_k_counts,
    calculate_nDCG,
)


def _softmax(x: np.ndarray, axis: int) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def dual_softmax(text_embeds: np.ndarray, vid_embeds: np.ndarray,
                 temperature: float = 500.0) -> np.ndarray:
    """EgoVLP+ dual-softmax rescoring (test_epic.py:139-143): operates on
    RAW dot products (not cosine)."""
    s = text_embeds @ vid_embeds.T
    s = _softmax(s / temperature, axis=1) * s
    return _softmax(s, axis=0)


def cosine_rescaled(text_embeds: np.ndarray, vid_embeds: np.ndarray
                    ) -> np.ndarray:
    t = text_embeds / np.maximum(
        np.linalg.norm(text_embeds, axis=1, keepdims=True), 1e-8)
    v = vid_embeds / np.maximum(
        np.linalg.norm(vid_embeds, axis=1, keepdims=True), 1e-8)
    return (t @ v.T + 1) / 2


def evaluate_epic_mir(text_embeds: np.ndarray, vid_embeds: np.ndarray,
                      video_ids: Sequence, text_ids: Sequence,
                      relevancy: np.ndarray,
                      use_dual_softmax: bool = True) -> Dict[str, float]:
    """text/vid embeds are in dataset order (one row per test clip)."""
    if use_dual_softmax:
        sim = dual_softmax(text_embeds, vid_embeds)
    else:
        sim = cosine_rescaled(text_embeds, vid_embeds)

    # first-occurrence index per video id (== list.index semantics, but
    # O(N) instead of the reference's O(N^2) scan, run/test_epic.py:129-136)
    first_pos: Dict = {}
    for i, v in enumerate(video_ids):
        first_pos.setdefault(v, i)
    indexes = [first_pos[t] for t in text_ids]
    sim = sim.T[:, indexes]  # -> [video, sentence]

    vis_k = calculate_k_counts(relevancy)
    txt_k = calculate_k_counts(relevancy.T)
    vis_nDCG = calculate_nDCG(sim, relevancy, vis_k,
                              IDCG=calculate_IDCG(relevancy, vis_k))
    txt_nDCG = calculate_nDCG(sim.T, relevancy.T, txt_k,
                              IDCG=calculate_IDCG(relevancy.T, txt_k))
    vis_mAP = calculate_mAP(sim, relevancy)
    txt_mAP = calculate_mAP(sim.T, relevancy.T)
    return {
        "nDCG_V2T": vis_nDCG * 100, "nDCG_T2V": txt_nDCG * 100,
        "nDCG_AVG": 50 * (vis_nDCG + txt_nDCG),
        "mAP_V2T": vis_mAP * 100, "mAP_T2V": txt_mAP * 100,
        "mAP_AVG": 50 * (vis_mAP + txt_mAP),
    }


def embed_dataset(model, params, loader, input_res: int = 224,
                  progress: bool = False, return_meta: bool = False):
    """Embed every (text, video) pair of an EPIC loader in dataset order.
    Returns (text_embeds, vid_embeds, item_indices); with
    ``return_meta=True`` also a {"texts", "paths"} dict in the same order
    (the reference trainers' meta_arr for the visualizer,
    trainer_epic.py:255-267)."""
    from egovlp_tpu.train.steps import make_embed_step

    embed = make_embed_step(input_res)
    t_all, v_all, idx_all = [], [], []
    texts, paths = [], []
    it = loader.epoch(0)
    if progress:
        import tqdm

        it = tqdm.tqdm(it, total=len(loader))
    for batch in it:
        t, v = embed(model.apply, params, batch["frames"],
                     batch["text_ids"], batch["text_mask"])
        t_all.append(np.asarray(t))
        v_all.append(np.asarray(v))
        idx_all.append(np.asarray(batch["item_v"]))
        texts.extend(batch.get("text", [""] * len(t)))
        paths.extend(batch.get("path", [""] * len(t)))

    # multi-process: gather every process's shard before assembling the
    # global (text x video) matrix (reference trainer_epic.py:211-225);
    # item_v indices drop shard pads and restore dataset order
    from egovlp_tpu.core.dist_eval import gather_eval

    g, gobj = gather_eval(
        {"t": np.concatenate(t_all), "v": np.concatenate(v_all),
         "idx": np.concatenate(idx_all)},
        index=np.concatenate(idx_all),
        objects={"texts": texts, "paths": paths},
    )
    out = (g["t"], g["v"], g["idx"])
    if return_meta:
        return out + ({"texts": gobj["texts"], "paths": gobj["paths"]},)
    return out
