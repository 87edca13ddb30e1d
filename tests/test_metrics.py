"""Metric golden tests, including the reference's own nDCG self-test."""

import numpy as np
import pytest

from egovlp_tpu.metrics import (
    calculate_DCG,
    calculate_IDCG,
    calculate_k_counts,
    calculate_mAP,
    calculate_nDCG,
    charades_metrics,
    egomcq_accuracy_metrics,
    oscc_metrics,
    pnr_metrics,
    t2v_metrics,
    v2t_metrics,
)
from egovlp_tpu.metrics.mir import mir_metrics_from_matrices


def test_ndcg_reference_golden():
    """The reference ships this exact self-test (utils/nDCG.py:136-164)."""
    sim = np.array([
        [1.0, 0.7, 0.4, 0.0],
        [0.3, 0.9, 0.6, 0.1],
        [0.2, 0.5, 0.8, 0.4],
    ])
    rel = np.array([
        [1.0, 0.5, 0.25, 0.0],
        [0.0, 1.0, 0.4, 0.0],
        [0.5, 0.3, 1.0, 0.0],
    ])
    k = np.array([
        [1, 1, 1, 0],
        [1, 1, 0, 0],
        [1, 1, 1, 0],
    ])
    assert (k == calculate_k_counts(rel)).all()
    ndcg = calculate_nDCG(sim, rel, k)
    assert ndcg == 0.9371789900735429
    DCG = calculate_DCG(sim, rel, k)
    IDCG = calculate_IDCG(rel, k)
    assert ndcg == np.mean(DCG / IDCG)


def test_map_perfect_and_worst():
    rel = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    perfect = np.array([[0.9, 0.1, 0.0], [0.1, 0.9, 0.0]])
    assert calculate_mAP(perfect, rel) == 1.0
    worst = np.array([[0.0, 0.5, 0.9], [0.9, 0.0, 0.5]])
    assert calculate_mAP(worst, rel) == pytest.approx(1 / 3)


def test_map_graded_relevancy():
    """Graded (non-1) relevancies contribute to cumulative gain but are not
    counted as hits (reference utils/mAP.py:31-38)."""
    rel = np.array([[0.5, 1.0]])
    sim = np.array([[0.9, 0.1]])  # retrieves the 0.5-graded item first
    # ranked rel = [0.5, 1.0]; hits at rank2: cum = 1.5, prec = 1.5/2
    assert calculate_mAP(sim, rel) == pytest.approx(0.75)


def test_t2v_v2t_identity():
    n = 6
    sims = np.eye(n) * 2 + np.random.default_rng(0).uniform(0, 0.5, (n, n))
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0 and m["MedR"] == 1.0
    m2 = v2t_metrics(sims)
    assert m2["R1"] == 100.0


def test_t2v_multiple_captions_per_video():
    # 4 captions, 2 videos -> 2 captions each
    sims = np.array([
        [0.9, 0.1],
        [0.2, 0.3],  # wrong: rank 1 for video 0
        [0.1, 0.8],
        [0.7, 0.6],  # wrong
    ])
    m = t2v_metrics(sims)
    assert m["R1"] == pytest.approx(50.0)


def test_egomcq_accuracy_grouping():
    preds = np.array([
        [0.9, 0.0, 0.0, 0.0, 0.0],  # type 1 correct (label 0)
        [0.0, 0.9, 0.0, 0.0, 0.0],  # type 1 wrong   (label 0)
        [0.0, 0.9, 0.0, 0.0, 0.0],  # type 2 correct (label 1)
    ])
    labels = np.array([0, 0, 1])
    types = np.array([1, 1, 2])
    m = egomcq_accuracy_metrics(preds, labels, types)
    # ascending type ids map to (Intra, Inter) — see module docstring
    assert m["Intra-video"] == pytest.approx(50.0)
    assert m["Inter-video"] == pytest.approx(100.0)


def test_oscc_metrics():
    preds = np.array([[0.2, 0.8], [0.9, 0.1], [0.4, 0.6]])
    labels = np.array([1, 0, 0])
    assert oscc_metrics(preds, labels)["accuracy"] == pytest.approx(200 / 3)


def test_pnr_metrics():
    # one state-change clip: pred argmax at idx 4, parent 0..160 frames,
    # pnr at frame 50, fps 10 -> mapped = 160/16*4 = 40, err = 10/10 = 1 s
    preds = np.zeros((2, 16))
    preds[0, 4] = 1.0
    preds[1, 0] = 1.0  # non-state-change, ignored
    m = pnr_metrics(
        preds,
        labels=np.zeros(2),
        sc_labels=np.array([1, 0]),
        fps=np.array([10.0, 30.0]),
        parent_start_frames=np.array([0, 0]),
        parent_end_frames=np.array([160, 160]),
        parent_pnr_frames=np.array([50, 50]),
    )
    assert m["keyframe_distance"] == pytest.approx(1.0)


def test_charades_metrics_empty_gt_rows():
    gt = np.array([
        [1, 0],
        [0, 0],  # empty row -> scores forced to -inf
        [0, 1],
    ])
    sub = np.array([
        [0.9, 0.2],
        [0.95, 0.9],  # would pollute both classes if not masked
        [0.1, 0.8],
    ])
    m = charades_metrics(sub, gt)
    assert m["mAP"] == pytest.approx(1.0)


def test_mir_metrics_from_matrices_identity():
    """Identity ordering + diagonal relevancy -> perfect retrieval."""
    n = 4
    rng = np.random.default_rng(1)
    sim_tv = np.eye(n) + rng.uniform(-0.2, 0.2, (n, n))  # text x video
    video_ids = [f"nar_{i}" for i in range(n)]
    text_ids = list(video_ids)
    relevancy = np.eye(n)
    m = mir_metrics_from_matrices(
        sim_tv, np.arange(n), video_ids, text_ids, relevancy
    )
    assert m["mAP_AVG"] == pytest.approx(100.0)
    assert m["nDCG_AVG"] == pytest.approx(100.0)


def test_v2t_multiple_captions_takes_closest():
    """v2t ranks by the CLOSEST ground-truth caption when a video has
    several (metric.py:176-190)."""
    # 4 captions, 2 videos (2 caps each); sims[text, video]
    sims = np.array([
        [0.1, 0.0],   # cap 0 of video 0 (far)
        [0.9, 0.0],   # cap 1 of video 0 (close)  -> rank 0 for video 0
        [0.0, 0.2],   # cap 2 of video 1
        [0.0, 0.8],   # cap 3 of video 1          -> rank 0 for video 1
    ])
    m = v2t_metrics(sims)
    assert m["R1"] == pytest.approx(100.0)


def test_v2t_rank_averaging_ties():
    """All-equal similarities: tie ranks are averaged, not optimistic."""
    sims = np.zeros((3, 3))
    m = v2t_metrics(sims)
    # every rank is the average of 0,1,2 = 1.0 -> MedR = 2.0
    assert m["MedR"] == pytest.approx(2.0)


def _v2t_loop_reference(sims, query_masks=None):
    """Direct transliteration of the pre-vectorization per-video loop
    (reference metric.py:157-190 semantics); oracle for the vectorized
    v2t_metrics."""
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
    return ranks


@pytest.mark.parametrize("caps_per_video", [1, 3])
@pytest.mark.parametrize("quantize", [False, True])
def test_v2t_vectorized_matches_loop(caps_per_video, quantize):
    """The blockwise-vectorized v2t_metrics reproduces the per-video
    sort/tie-average loop exactly, including heavy ties."""
    rng = np.random.default_rng(7)
    n_vids = 23
    sims = rng.normal(size=(n_vids * caps_per_video, n_vids))
    if quantize:  # force many exact ties
        sims = np.round(sims * 2) / 2
    got = v2t_metrics(sims)
    want = _v2t_loop_reference(sims)
    ref = t2v_metrics.__globals__["_summarize"](np.asarray(want), n_vids)
    for k in ref:
        assert got[k] == pytest.approx(ref[k]), k


def test_v2t_vectorized_matches_loop_with_mask():
    rng = np.random.default_rng(11)
    n_vids, cpv = 12, 2
    sims = np.round(rng.normal(size=(n_vids * cpv, n_vids)) * 3) / 3
    mask = rng.integers(0, 2, size=n_vids * cpv)
    mask[0] = 1  # keep at least one valid caption
    got = v2t_metrics(sims, query_masks=mask)
    want = _v2t_loop_reference(sims, query_masks=mask)
    ref = t2v_metrics.__globals__["_summarize"](np.asarray(want), n_vids)
    for k in ref:
        if np.isnan(ref[k]) or np.isinf(ref[k]):
            assert np.isnan(got[k]) or np.isinf(got[k]), k
        else:
            assert got[k] == pytest.approx(ref[k]), k


def test_v2t_blockwise_small_blocks(monkeypatch):
    """A forced 1-row block budget agrees with the one-shot pass."""
    import egovlp_tpu.metrics.retrieval as R

    rng = np.random.default_rng(3)
    sims = np.round(rng.normal(size=(16, 8)) * 2) / 2  # cpv=2, with ties
    full = v2t_metrics(sims)
    monkeypatch.setattr(R, "_V2T_BLOCK_BUDGET", 1)
    assert v2t_metrics(sims) == full
