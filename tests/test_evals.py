"""Eval-path integration tests with tiny towers on synthetic fixtures."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.data.datasets import (
    CharadesEgoDataset,
    DatasetConfig,
    Ego4DOSCCDataset,
    EpicMIRDataset,
)
from egovlp_tpu.data.pipeline import Loader
from egovlp_tpu.data.text import WordPieceTokenizer
from egovlp_tpu.models import DualEncoder, DualEncoderConfig

from tests.test_datasets import charades_root, epic_root, oscc_root  # noqa: F401
from tests.test_train_eval import TINY, RES, tiny_model, vocab_file  # noqa: F401


def _cfg(**kw):
    kw.setdefault("pre_size", RES)
    return DatasetConfig(**kw)


def test_epic_embed_and_mir_eval(epic_root, vocab_file, tiny_model):  # noqa: F811
    from egovlp_tpu.evals.epic_mir import embed_dataset, evaluate_epic_mir

    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = EpicMIRDataset(_cfg(data_dir=epic_root, meta_dir=epic_root,
                             split="test", num_frames=4))
    loader = Loader(ds, batch_size=2, tokenizer=tok, shuffle=False,
                    drop_last=False)
    t, v, idx = embed_dataset(model, params, loader, input_res=RES)
    assert t.shape == (4, 8) and v.shape == (4, 8)
    np.testing.assert_array_equal(idx, np.arange(4))

    video_ids = [f"P01_101_{i}" for i in range(4)]
    rel = np.eye(4)
    for ds_flag in (False, True):
        m = evaluate_epic_mir(t, v, video_ids, video_ids, rel,
                              use_dual_softmax=ds_flag)
        assert set(m) == {"nDCG_V2T", "nDCG_T2V", "nDCG_AVG",
                          "mAP_V2T", "mAP_T2V", "mAP_AVG"}
        for val in m.values():
            assert 0 <= val <= 100


def test_dual_softmax_shapes_and_scale(rng):
    from egovlp_tpu.evals.epic_mir import dual_softmax

    t = rng.normal(size=(5, 8)).astype(np.float32)
    v = rng.normal(size=(5, 8)).astype(np.float32)
    s = dual_softmax(t, v)
    assert s.shape == (5, 5)
    np.testing.assert_allclose(s.sum(axis=0), 1.0, rtol=1e-5)  # col softmax


def test_charades_eval(charades_root, vocab_file, tiny_model, tmp_path):  # noqa: F811
    from egovlp_tpu.evals.charades import evaluate_charades

    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = CharadesEgoDataset(_cfg(data_dir=charades_root, split="val",
                                 num_frames=4))
    loader = Loader(ds, batch_size=1, tokenizer=tok, shuffle=False,
                    drop_last=False)
    classes = [f"someone does thing {i}" for i in range(157)]
    m = evaluate_charades(model, params, loader, classes, tok, input_res=RES)
    assert "mAP" in m


def test_oscc_eval(oscc_root, tiny_model):  # noqa: F811
    from egovlp_tpu.evals.oscc_pnr import evaluate_oscc

    import dataclasses

    video16 = dataclasses.replace(TINY.video, num_frames=16)
    cfg = DualEncoderConfig(video=video16, text=TINY.text, projection_dim=2)
    model = DualEncoder(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, RES, RES, 3)),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
    )["params"]
    ds = Ego4DOSCCDataset(_cfg(data_dir=oscc_root, split="val",
                               num_frames=16))
    loader = Loader(ds, batch_size=1, shuffle=False, drop_last=False)
    m = evaluate_oscc(model, params, loader, input_res=RES)
    assert 0 <= m["accuracy"] <= 100


def test_feature_extraction(tmp_path, tiny_model, vocab_file):  # noqa: F811
    """NLQ-style dense video + text feature extraction round trip."""
    from egovlp_tpu.evals.features import (
        extract_text_features,
        extract_video_features,
    )

    model, params = tiny_model

    class FakeDenseDataset:
        def __len__(self):
            return 2

        def get(self, i, rng):
            return {
                "frames": np.zeros((10, RES, RES, 3), np.uint8),
                "meta": {"clip_uid": f"clip_{i}"},
            }

    out = tmp_path / "feats"
    extract_video_features(model, params, FakeDenseDataset(), str(out),
                           num_frames=4, input_res=RES, micro_batch=2)
    f = np.load(out / "clip_0.npy")
    assert f.shape == (2, 8)  # 10 frames -> 2 windows of 4, proj dim 8

    class FakeTextDataset:
        def __len__(self):
            return 3

        def get(self, i, rng):
            return {"text": f"query {i}",
                    "meta": {"clip_uid": "clip_0"}}

    tok = WordPieceTokenizer(vocab_file, max_length=8)
    out_t = tmp_path / "tfeats"
    extract_text_features(model, params, FakeTextDataset(), tok, str(out_t))
    assert sorted(os.listdir(out_t)) == [
        "clip_0_sentence_0.npy", "clip_0_sentence_1.npy",
        "clip_0_sentence_2.npy",
    ]
    assert np.load(out_t / "clip_0_sentence_0.npy").shape == (8,)

    # token-level features
    out_tl = tmp_path / "tlfeats"
    extract_text_features(model, params, FakeTextDataset(), tok, str(out_tl),
                          token_level=True)
    assert np.load(out_tl / "clip_0_sentence_0.npy").shape == (8, 8)


def test_epic_visualizer_emits_ranking_report(epic_root, vocab_file,  # noqa: F811
                                              tiny_model, tmp_path):
    """The visualizer section wires into the eval path: a non-empty type
    yields an HTML top-k ranking page (reference run/train_epic.py:26-34 +
    utils/visualizer.py:48-142)."""
    from egovlp_tpu.evals.epic_mir import embed_dataset
    from egovlp_tpu.io.visualizer import build_visualizer
    from egovlp_tpu.models.dual_encoder import sim_matrix

    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = EpicMIRDataset(_cfg(data_dir=epic_root, meta_dir=epic_root,
                             split="test", num_frames=4))
    loader = Loader(ds, batch_size=2, tokenizer=tok, shuffle=False,
                    drop_last=False)
    t, v, idx, meta = embed_dataset(model, params, loader, input_res=RES,
                                    return_meta=True)
    assert len(meta["texts"]) == 4 and len(meta["paths"]) == 4
    assert meta["paths"][0] == "P01/rgb_frames/P01_101"

    vis = build_visualizer(
        {"visualizer": {"type": "RetrievalVis",
                        "args": {"web_dir": str(tmp_path / "web"),
                                 "num_samples": 3}}},
        str(tmp_path / "unused"))
    assert vis is not None
    sims = np.asarray(sim_matrix(jnp.asarray(t), jnp.asarray(v)))
    page = vis.visualize_ranking(sims, 0, meta["texts"], meta["paths"])
    text = page.read_text()
    assert "GT rank" in text and "cut the onion" in text
    assert (tmp_path / "web" / "index.html").exists()

    # disabled config (all shipped configs) -> None
    assert build_visualizer({"visualizer": {"type": ""}}, ".") is None
    assert build_visualizer({}, ".") is None


def test_charades_eval_with_visualizer(charades_root, vocab_file,  # noqa: F811
                                       tiny_model, tmp_path):
    from egovlp_tpu.evals.charades import evaluate_charades
    from egovlp_tpu.io.visualizer import RetrievalVisualizer

    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = CharadesEgoDataset(_cfg(data_dir=charades_root, split="val",
                                 num_frames=4))
    loader = Loader(ds, batch_size=1, tokenizer=tok, shuffle=False,
                    drop_last=False)
    classes = [f"someone does thing {i}" for i in range(157)]
    vis = RetrievalVisualizer(str(tmp_path / "web"), num_samples=2)
    m = evaluate_charades(model, params, loader, classes, tok, input_res=RES,
                          visualizer=vis)
    assert "mAP" in m
    page = tmp_path / "web" / "ranking_ep0.html"
    assert page.exists()
    assert "VID01EGO.mp4" in page.read_text()
    assert "GT rank" not in page.read_text()  # multi-label: no GT highlight


def test_visualise_path_grid_semantics():
    """Alignment-path grid (reference utils/visualisation.py:8-38): NaN
    band cells grey, targets blue, correct predictions green, wrong red;
    rows re-indexed to unique target clip ids."""
    from egovlp_tpu.io.visualizer import batch_path_vis, visualise_path

    window = np.zeros((5, 6), np.float32)
    window[0, 5] = np.nan
    pred = [(1, 1), (3, 2)]
    target = [(1, 1), (3, 4)]
    grid = visualise_path(pred, target, window)
    assert grid.shape == (3, 5, 6) and grid.dtype == np.float32
    # unique target clip ids [1, 3] -> rows 0, 1
    np.testing.assert_allclose(grid[:, 0, 1] * 255, [64, 191, 64])    # tp
    np.testing.assert_allclose(grid[:, 1, 4] * 255, [102, 153, 255])  # gt
    np.testing.assert_allclose(grid[:, 1, 2] * 255, [191, 64, 64])    # fp
    np.testing.assert_allclose(grid[:, 0, 5] * 255, [130, 130, 130])  # NaN
    np.testing.assert_allclose(grid[:, 4, 0] * 255, [255, 255, 255])
    # a prediction whose clip id has no target row raises, exactly like
    # the reference's list.index (its own __main__ demo input trips this)
    with pytest.raises(ValueError):
        visualise_path([(2, 4)], target, window)

    # a wrong prediction on a target row renders red
    grid2 = visualise_path([(3, 0)], target, window)
    np.testing.assert_allclose(grid2[:, 1, 0] * 255, [191, 64, 64])   # fp

    batch = batch_path_vis({"dtw": [(1, 1)], "min_dist": [(3, 4)]},
                           target, window)
    assert batch.shape == (2, 3, 5, 6)
    # min_dist renders on a zeroed window: the NaN cell turns white
    np.testing.assert_allclose(batch[1][:, 0, 5] * 255, [255, 255, 255])
