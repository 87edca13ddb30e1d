"""Dataset + pipeline tests over synthetic fixtures (tiny mp4s, jpeg dirs,
metadata files)."""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pd = pytest.importorskip("pandas")

from egovlp_tpu.data.datasets import (
    CharadesEgoDataset,
    DatasetConfig,
    EgoClipDataset,
    Ego4DOSCCDataset,
    Ego4DPNRDataset,
    EgoMCQDataset,
    EpicMIRDataset,
    dataset_factory,
)
from egovlp_tpu.data.pipeline import Loader, collate, shard_indices
from tests.test_readers import make_video

PRE = 32


def _cfg(**kw):
    kw.setdefault("pre_size", PRE)
    kw.setdefault("loading", "strict")
    return DatasetConfig(**kw)


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def egoclip_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("egoclip")
    (root / "vid_a").mkdir()
    make_video(root / "vid_a" / "0.mp4", n_frames=90)  # 3 s @30fps
    rows = []
    for i in range(6):
        rows.append({
            "video_uid": "vid_a",
            "video_dur": 3.0,
            "narration_source": "narration_pass_1",
            "narration_ind": i,
            "narration_time": 0.2 + 0.4 * i,
            "clip_start": 0.1 + 0.3 * i,
            "clip_end": 0.8 + 0.3 * i,
            "clip_text": f"#C C does thing {i}",
            "tag_verb": f"[{i % 3}]",
            "tag_noun": f"[{i % 4}]",
        })
    pd.DataFrame(rows).to_csv(root / "egoclip.csv", sep="\t", index=False)

    mcq = {}
    for q in range(3):
        mcq[str(q)] = {
            "query": {"video_uid": "vid_a", "clip_start": 0.1, "clip_end": 0.9,
                      "clip_text": f"query {q}"},
            "choices": {
                str(i): {"video_uid": "vid_a", "clip_start": 0.2 * i,
                         "clip_end": 0.2 * i + 0.5,
                         "clip_text": f"opt {i}"}
                for i in range(5)
            },
            "answer": q % 5,
            "types": 1 + q % 2,
        }
    (root / "egomcq.json").write_text(json.dumps(mcq))
    return str(root)


@pytest.fixture(scope="module")
def epic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic")
    n = 4
    frame_dir = root / "P01" / "rgb_frames" / "P01_101"
    frame_dir.mkdir(parents=True)
    for i in range(1, 40):
        img = np.full((48, 64, 3), min(i * 6, 255), np.uint8)
        cv2.imwrite(str(frame_dir / f"frame_{i:010d}.jpg"), img)

    clips = pd.DataFrame({
        "narration_id": [f"P01_101_{i}" for i in range(n)],
        "participant_id": ["P01"] * n,
        "video_id": ["P01/rgb_frames/P01_101"] * n,
        "narration_timestamp": ["00:00:01"] * n,
        "start_timestamp": ["00:00:01"] * n,
        "stop_timestamp": ["00:00:02"] * n,
        "start_frame": [1 + 8 * i for i in range(n)],
        "stop_frame": [9 + 8 * i for i in range(n)],
        "narration": [f"cut the onion {i}" for i in range(n)],
    })
    clips.to_csv(root / "EPIC_100_retrieval_train.csv", index=False)
    clips.to_csv(root / "EPIC_100_retrieval_test.csv", index=False)
    sent = pd.DataFrame({
        "narration_id": [f"P01_101_{i}" for i in range(n)],
        "narration": [f"cut the onion {i}" for i in range(n)],
    })
    sent.to_csv(root / "EPIC_100_retrieval_train_sentence.csv", index=False)
    sent.to_csv(root / "EPIC_100_retrieval_test_sentence.csv", index=False)
    (root / "relevancy").mkdir()
    rel = np.eye(n) * 1.0 + 0.05
    for name in ("train", "test"):
        with open(root / "relevancy" /
                  f"caption_relevancy_EPIC_100_retrieval_{name}.pkl", "wb") as f:
            pickle.dump(rel, f)
    return str(root)


@pytest.fixture(scope="module")
def charades_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("charades")
    make_video(root / "VID01EGO.mp4", n_frames=60)
    pd.DataFrame({
        "id": ["VID01EGO"] * 2,
        "narration": ["someone opens a door", "a person sits"],
        "cls": ["c092", "c101"],
        "t_start": [0.0, 0.5],
        "t_end": [1.0, 1.5],
    }).to_csv(root / "metadata_train.csv", sep="\t", index=False)
    pd.DataFrame({
        "id": ["VID01EGO"],
        "subject": ["s1"], "scene": ["x"], "quality": [5], "relevance": [5],
        "verified": ["Yes"],
        "descriptions": ["a person opens a door then sits"],
        "actions": ["c092 0.0 1.0;c101 0.5 1.5"],
        "length": [2.0],
    }).to_csv(root / "CharadesEgo_v1_test_only1st.csv", index=False)
    return str(root)


@pytest.fixture(scope="module")
def oscc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oscc")
    clips = []
    for u, state in (("uid_pos", True), ("uid_neg", False)):
        d = root / ("frames_jpeg" if state else "frames_jpeg_neg") / u
        d.mkdir(parents=True)
        for fn in range(0, 400):
            img = np.full((36, 48, 3), min(fn, 255), np.uint8)
            cv2.imwrite(str(d / f"{fn}.jpeg"), img)
        clips.append({
            "unique_id": u,
            "video_uid": "v",
            "clip_id": "c",
            "state_change": state,
            "clip_pnr_frame": 100 if state else None,
            "parent_pnr_frame": 150 if state else None,
            "clip_start_sec": 0.0,
            "clip_end_sec": 8.0,
            "parent_start_sec": 0.0,
            "parent_end_sec": 8.0,
            "clip_start_frame": 0,
            "clip_end_frame": 240,
            "parent_start_frame": 0,
            "parent_end_frame": 240,
        })
    for split in ("train", "val"):
        (root / f"fho_oscc-pnr_{split}.json").write_text(
            json.dumps({"clips": clips})
        )
    return str(root)


# --------------------------------------------------------------------------
# EgoClip / EgoMCQ
# --------------------------------------------------------------------------

def test_egoclip_train_item(egoclip_root, rng):
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=4))
    assert len(ds) == 6
    item = ds.get(0, rng)
    assert item["frames"].shape == (4, PRE, PRE, 3)
    assert item["noun_vec"].shape == (582,) and item["noun_vec"].sum() == 1
    assert item["verb_vec"].shape == (118,)
    assert item["text"] == "#C C does thing 0"


def test_egoclip_scene_negatives(egoclip_root, rng):
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=4, neg_param=1))
    item = ds.get(0, rng)
    assert "frames_neg" in item and item["frames_neg"].shape == (4, PRE, PRE, 3)
    assert "noun_vec_neg" in item and "text_neg" in item


def test_egomcq_item(egoclip_root, rng):
    ds = EgoMCQDataset(_cfg(data_dir=egoclip_root, split="val", num_frames=4))
    assert len(ds) == 3
    item = ds.get(1, rng)
    assert item["frames_options"].shape == (5, 4, PRE, PRE, 3)
    assert item["correct"] == 1
    assert item["type"] in (1, 2)
    assert len(item["text_options"]) == 5


def test_egomcq_sorted_decode_keeps_slot_order(egoclip_root, rng):
    """Options DECODE in (video, start) order for seek locality but the
    output slots must keep the reference's dict insertion order: slot i is
    option key i's clip, independent of decode order (the val sampler is
    deterministic, so each option's frames equal a direct _read_clip)."""
    ds = EgoMCQDataset(_cfg(data_dir=egoclip_root, split="val", num_frames=4))
    item = ds.get(1, rng)
    with open(os.path.join(egoclip_root, "egomcq.json")) as f:
        meta = json.load(f)
    options = meta[sorted(meta.keys(), key=int)[1]]["choices"]
    helper = EgoClipDataset.__new__(EgoClipDataset)
    helper.cfg = ds.cfg
    for i, key in enumerate(options.keys()):
        want = helper._read_clip(options[key], rng)
        np.testing.assert_array_equal(
            item["frames_options"][i], want,
            err_msg=f"slot {i} (option key {key})")


def test_dataset_factory_dispatch(egoclip_root):
    ds = dataset_factory("EgoClip_EgoMCQ")(
        _cfg(data_dir=egoclip_root, split="val", num_frames=2)
    )
    assert isinstance(ds, EgoMCQDataset)


# --------------------------------------------------------------------------
# EPIC
# --------------------------------------------------------------------------

def test_epic_train_item(epic_root, rng):
    ds = EpicMIRDataset(_cfg(data_dir=epic_root, meta_dir=epic_root,
                             split="train", num_frames=4))
    item = ds.get(0, rng)
    assert item["frames"].shape == (4, PRE, PRE, 3)
    assert item["relation"] >= 0.1  # sampled positive carries relevancy
    assert item["item_v"] == 0


def test_epic_test_item(epic_root, rng):
    ds = EpicMIRDataset(_cfg(data_dir=epic_root, meta_dir=epic_root,
                             split="test", num_frames=4))
    item = ds.get(2, rng)
    assert item["text"] == "cut the onion 2"
    assert item["item_t"] == -1


# --------------------------------------------------------------------------
# Charades
# --------------------------------------------------------------------------

def test_charades_train_item(charades_root, rng):
    ds = CharadesEgoDataset(_cfg(data_dir=charades_root, split="train",
                                 num_frames=4))
    item = ds.get(0, rng)
    assert item["frames"].shape == (4, PRE, PRE, 3)
    assert item["target"] == 92


def test_charades_val_multihot(charades_root, rng):
    ds = CharadesEgoDataset(_cfg(data_dir=charades_root, split="val",
                                 num_frames=4))
    item = ds.get(0, rng)
    assert item["target"].shape == (157,)
    assert item["target"][92] == 1 and item["target"][101] == 1
    assert item["target"].sum() == 2


# --------------------------------------------------------------------------
# OSCC / PNR
# --------------------------------------------------------------------------

def test_oscc_items(oscc_root, rng):
    ds = Ego4DOSCCDataset(_cfg(data_dir=oscc_root, split="val",
                               num_frames=16))
    assert len(ds) == 2
    pos = ds.get(0, rng)
    assert pos["frames"].shape == (16, PRE, PRE, 3)
    assert pos["state"] == 1
    assert pos["labels"].sum() == 1.0  # one-hot keyframe
    neg = ds.get(1, rng)
    assert neg["state"] == 0


def test_oscc_train_random_window(oscc_root, rng):
    ds = Ego4DOSCCDataset(_cfg(data_dir=oscc_root, split="train",
                               num_frames=16))
    item = ds.get(0, rng)
    assert item["frames"].shape == (16, PRE, PRE, 3)


def test_pnr_keeps_only_state_change(oscc_root):
    ds = Ego4DPNRDataset(_cfg(data_dir=oscc_root, split="val", num_frames=16))
    assert len(ds) == 1


# --------------------------------------------------------------------------
# pipeline
# --------------------------------------------------------------------------

def test_shard_indices_disjoint_cover():
    shards = [shard_indices(103, epoch=2, shuffle=True, seed=1, shard=s,
                            num_shards=4) for s in range(4)]
    lens = {len(s) for s in shards}
    assert lens == {25}
    union = np.concatenate(shards)
    assert len(np.unique(union)) == 100  # 103 -> trim to 100, disjoint


def test_loader_batches(egoclip_root, tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "c", "does", "thing",
             "#", "0", "1", "2", "3", "4", "5"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    from egovlp_tpu.data.text import WordPieceTokenizer

    tok = WordPieceTokenizer(str(vp), max_length=8)
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=2))
    loader = Loader(ds, batch_size=2, tokenizer=tok, num_workers=2, seed=7)
    batches = list(loader.epoch(0))
    assert len(batches) == 3 == len(loader)
    b = batches[0]
    assert b["frames"].shape == (2, 2, PRE, PRE * 3)  # channel-folded
    assert b["text_ids"].shape == (2, 8)
    assert b["noun_vec"].shape == (2, 582)


def test_loader_sharded(egoclip_root):
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=2))
    l0 = Loader(ds, batch_size=1, shard=0, num_shards=2, shuffle=False)
    l1 = Loader(ds, batch_size=1, shard=1, num_shards=2, shuffle=False)
    t0 = [b["text"][0] for b in l0.epoch(0)]
    t1 = [b["text"][0] for b in l1.epoch(0)]
    assert len(t0) == len(t1) == 3
    assert not set(t0) & set(t1)


def test_collate_mcq_text_options(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "b"]
    vp = tmp_path / "v.txt"
    vp.write_text("\n".join(vocab))
    from egovlp_tpu.data.text import WordPieceTokenizer

    tok = WordPieceTokenizer(str(vp), max_length=4)
    items = [
        {"text": "a", "text_options": ["a", "b", "a b", "b a", "a"]},
        {"text": "b", "text_options": ["b", "a", "a a", "b b", "b"]},
    ]
    out = collate(items, tok)
    assert out["text_ids"].shape == (2, 4)
    assert out["text_options_ids"].shape == (2, 5, 4)


def test_multi_loader_round_robin(egoclip_root):
    from egovlp_tpu.data.pipeline import MultiLoader

    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=2))
    l0 = Loader(ds, batch_size=1, shuffle=False)
    l1 = Loader(ds, batch_size=2, shuffle=False)
    ml = MultiLoader([l0, l1])
    assert len(ml) == 3
    assert ml.batch_size == 3
    tuples = list(ml.epoch(0))
    assert len(tuples) == 3
    b0, b1 = tuples[0]
    assert b0["frames"].shape[0] == 1 and b1["frames"].shape[0] == 2


def test_device_prefetch(egoclip_root):
    import jax

    from egovlp_tpu.core.mesh import MeshSpec, create_mesh
    from egovlp_tpu.data.pipeline import device_prefetch

    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=2))
    loader = Loader(ds, batch_size=2, shuffle=False)
    mesh = create_mesh(MeshSpec(), jax.devices()[:2])
    batches = list(device_prefetch(loader.epoch(0), mesh))
    assert len(batches) == 3
    assert batches[0]["frames"].shape == (2, 2, PRE, PRE * 3)  # folded
    assert "data" in str(batches[0]["frames"].sharding.spec)


def test_max_samples_per_epoch_truncates_and_cycles(egoclip_root):
    """max_samples_per_epoch below the dataset size truncates the epoch;
    ABOVE it the epoch cycles the same order (the reference stretches
    epochs by wrapping its loader in utils/util.py::inf_loop and bounding
    on max_samples_per_epoch alone, trainer_egoclip.py:104-105)."""
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=2))  # 6 items
    short = Loader(ds, batch_size=2, shuffle=False, max_samples_per_epoch=4)
    assert len(short) == 2
    assert len(list(short.epoch(0))) == 2

    stretched = Loader(ds, batch_size=2, shuffle=False,
                       max_samples_per_epoch=14)
    assert len(stretched) == 7
    batches = list(stretched.epoch(0))
    assert len(batches) == 7
    texts = [t for b in batches for t in b["text"]]
    assert texts[:6] == texts[6:12]  # cycled same epoch order
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=2))
    loader = Loader(ds, batch_size=2, shuffle=False)
    b = next(iter(loader.epoch(0)))
    assert b["frames"].shape == (2, 2, PRE, PRE * 3)


def test_expand_temporal_windows(egoclip_root):
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="test",
                             num_frames=4))
    pairs = ds.expand_temporal_windows([100, 8], stride=5)
    # vlen 100 -> stop int(100/(4+1)) = 20 -> fix_starts 0,5,10,15
    # (the reference's len(x - 1) is the len of the BOUNDARY array, nf+1)
    assert [fs for i, fs in pairs if i == 0] == [0, 5, 10, 15]
    # vlen 8 -> stop int(8/5) = 1 -> fix_start 0
    assert [fs for i, fs in pairs if i == 1] == [0]


@pytest.fixture(scope="module")
def webvid_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("webvid")
    (root / "videos").mkdir()
    make_video(root / "videos" / "101.mp4", n_frames=50)
    make_video(root / "videos" / "102.mp4", n_frames=10)
    (root / "metadata").mkdir()
    df = pd.DataFrame({"videoid": [101, 102],
                       "name": ["pouring water", "closing a jar"]})
    for split in ("train", "val"):
        df.to_csv(root / "metadata" / f"results_2M_{split}.csv", index=False)
    return str(root)


def test_sliding_window_expands_test_dataset(webvid_root):
    """sliding_window_stride wires end-to-end (reference
    base_dataset.py:51-54,76-83,96-105 + data_loader.py:25): the test split
    expands to one item per (video, fix_start) window, and each window's
    fix_start reaches the frame sampler."""
    from egovlp_tpu.data.datasets import WebVidDataset

    ds = WebVidDataset(_cfg(data_dir=webvid_root, split="test", num_frames=4,
                            sliding_window_stride=3))
    # vlen 50 -> stop int(50/5)=10 -> fix_starts 0,3,6,9; vlen 10 -> [0]
    assert ds._windows == [(0, 0), (0, 3), (0, 6), (0, 9), (1, 0)]
    assert len(ds) == 5

    rng = np.random.default_rng(0)
    # frame gray level encodes the decoded frame index (make_video), so
    # successive windows of video 0 must shift brighter by ~stride*4 gray
    means = [float(ds.get(i, rng)["frames"][0].mean()) for i in range(4)]
    deltas = np.diff(means)
    assert (deltas > 4).all(), means  # 3 frames * 4 gray/frame, lossy codec

    item = ds.get(4, rng)  # second video, single window
    assert item["frames"].shape == (4, PRE, PRE, 3)


def test_sliding_window_train_split_raises(webvid_root):
    from egovlp_tpu.data.datasets import WebVidDataset

    with pytest.raises(ValueError, match="test time"):
        WebVidDataset(_cfg(data_dir=webvid_root, split="train",
                           num_frames=4, sliding_window_stride=3))


def test_lax_loading_substitutes_black_frames(egoclip_root, tmp_path, rng):
    """Decode failure under loading='lax' yields black frames (the
    reference's data-level fault tolerance, base_dataset.py:109-115);
    'strict' raises."""
    import shutil

    broken = tmp_path / "broken_root"
    shutil.copytree(egoclip_root, broken)
    # corrupt the chunk file
    (broken / "vid_a" / "0.mp4").write_bytes(b"not a video")

    ds_lax = EgoClipDataset(_cfg(data_dir=str(broken), split="train",
                                 num_frames=4, loading="lax"))
    item = ds_lax.get(0, rng)
    assert item["frames"].shape == (4, PRE, PRE, 3)
    assert item["frames"].sum() == 0  # black

    ds_strict = EgoClipDataset(_cfg(data_dir=str(broken), split="train",
                                    num_frames=4, loading="strict"))
    with pytest.raises(ValueError):
        ds_strict.get(0, rng)


def test_shard_indices_no_drop_pads():
    shards = [shard_indices(10, epoch=0, shuffle=False, seed=0, shard=s,
                            num_shards=4, drop_last=False) for s in range(4)]
    assert all(len(s) == 3 for s in shards)
    union = np.concatenate(shards)
    assert set(union) == set(range(10))  # padding repeats, covers all


def test_egoclip_multi_tag_vectors(egoclip_root, tmp_path, rng):
    """Multi-tag taxonomy strings '[1, 5]' produce multi-hot vectors."""
    import shutil

    import pandas as pd

    root = tmp_path / "multi"
    shutil.copytree(egoclip_root, root)
    df = pd.read_csv(root / "egoclip.csv", sep="\t")
    df.loc[0, "tag_noun"] = "[1, 5, 5]"
    df.loc[0, "tag_verb"] = "[0, 2]"
    df.to_csv(root / "egoclip.csv", sep="\t", index=False)

    ds = EgoClipDataset(_cfg(data_dir=str(root), split="train", num_frames=2))
    item = ds.get(0, rng)
    assert item["noun_vec"].sum() == 2  # duplicates collapse
    assert item["noun_vec"][1] == 1 and item["noun_vec"][5] == 1
    assert item["verb_vec"].sum() == 2


class _HangingDataset:
    """Items decode instantly except idx==2, which hangs (straggler stub)."""

    def __init__(self, loading="lax", hang_idx=2, n=6):
        from egovlp_tpu.data.datasets.base import DatasetConfig

        self.cfg = DatasetConfig(split="train", num_frames=2, pre_size=8,
                                 loading=loading)
        self.hang_idx = hang_idx
        self.n = n

    def __len__(self):
        return self.n

    def get(self, idx, rng):
        import time

        if idx == self.hang_idx:
            time.sleep(8)  # far beyond the test's item_timeout
        return {"frames": np.full((2, 8, 8, 3), idx, np.uint8),
                "text": f"item {idx}"}


def test_loader_item_timeout_lax_substitutes_neighbor():
    """A straggler decode under loading='lax' is replaced by a healthy
    neighbour after item_timeout (loader-level fault tolerance the
    reference gets from worker processes + black-frame substitution)."""
    from egovlp_tpu.data.pipeline import Loader

    ds = _HangingDataset(loading="lax")
    loader = Loader(ds, batch_size=3, shuffle=False, drop_last=False,
                    num_workers=2, item_timeout=0.5)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    # batch 0 holds items 0,1,2; the hung idx 2 was substituted, so its
    # frame fill value matches one of the healthy items instead of 2
    fills = batches[0]["frames"][:, 0, 0, 0]
    assert set(fills.tolist()) <= {0, 1}
    assert batches[1]["frames"][:, 0, 0, 0].tolist() == [3, 4, 5]
    loader.close()


def test_loader_item_timeout_strict_raises():
    from egovlp_tpu.data.pipeline import Loader

    ds = _HangingDataset(loading="strict")
    loader = Loader(ds, batch_size=3, shuffle=False, drop_last=False,
                    num_workers=2, item_timeout=0.5)
    with pytest.raises(TimeoutError, match="item 2"):
        list(loader.epoch(0))
    loader.close()


def test_loader_process_pool_equals_threads(egoclip_root, tmp_path):
    """num_procs>0 decodes in spawned worker processes (the reference's
    torch-DataLoader model); the deterministic per-item rng makes the
    batches BYTE-identical to the threaded path."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "c", "does", "thing",
             "#", "0", "1", "2", "3", "4", "5"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    from egovlp_tpu.data.text import WordPieceTokenizer

    tok = WordPieceTokenizer(str(vp), max_length=8)
    ds = EgoClipDataset(_cfg(data_dir=egoclip_root, split="train",
                             num_frames=2))
    lt = Loader(ds, batch_size=2, tokenizer=tok, num_workers=2, seed=7)
    lp = Loader(ds, batch_size=2, tokenizer=tok, num_procs=2, seed=7)
    try:
        bt = list(lt.epoch(3))
        bp = list(lp.epoch(3))
        assert len(bt) == len(bp) == 3
        for a, b in zip(bt, bp):
            assert set(a) == set(b)
            for k in a:
                if isinstance(a[k], np.ndarray):
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)
                else:
                    assert a[k] == b[k], k
    finally:
        lt.close()
        lp.close()


class _CrashingDataset:
    """Items decode fine except idx==1, which kills the worker PROCESS —
    the segfault-in-native-decode stand-in. Picklable for spawn workers."""

    def __init__(self, n=4):
        from egovlp_tpu.data.datasets.base import DatasetConfig

        self.cfg = DatasetConfig(split="train", num_frames=2, pre_size=8,
                                 loading="lax")
        self.n = n

    def __len__(self):
        return self.n

    def get(self, idx, rng):
        import os

        if idx == 1:
            os._exit(1)  # hard-kill, like a native-decoder segfault
        return {"frames": np.full((2, 8, 8, 3), idx, np.uint8),
                "text": f"item {idx}"}


def test_loader_broken_process_pool_diagnosed_and_discarded():
    """A worker-process death surfaces as a clear RuntimeError (not a bogus
    timeout cascade), and the dead pool is discarded so the next epoch gets
    a fresh one."""
    from egovlp_tpu.data.pipeline import Loader

    loader = Loader(_CrashingDataset(), batch_size=2, shuffle=False,
                    drop_last=False, num_procs=2)
    with pytest.raises(RuntimeError, match="BrokenProcessPool"):
        list(loader.epoch(0))
    assert loader._pool is None  # discarded; epoch() would recreate
    loader.close()


def test_loader_recycles_pool_after_hung_worker_buildup():
    """Abandoned (timed-out) workers accumulate; once most of the pool is
    gone, the next epoch() recycles it instead of starving."""
    from egovlp_tpu.data.pipeline import Loader

    ds = _HangingDataset(loading="lax", hang_idx=2, n=6)
    loader = Loader(ds, batch_size=3, shuffle=False, drop_last=False,
                    num_workers=2, item_timeout=0.5)
    list(loader.epoch(0))  # one straggler -> half the 2-worker pool gone
    assert loader._abandoned == 1
    pool0 = loader._pool
    list(loader.epoch(1))  # recycled at this epoch boundary -> no starvation
    assert loader._pool is not pool0
    assert loader._abandoned == 1  # fresh pool; this epoch's straggler only
    loader.close()


@pytest.fixture(scope="module")
def nlq_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nlq")
    make_video(root / "vid_nlq.mp4", n_frames=90)  # 3 s @30fps
    anno = {"videos": [{
        "video_uid": "vid_nlq",
        "clips": [{
            "clip_uid": "clip0",
            "video_start_sec": 0.0,
            "video_end_sec": 2.5,
            "annotations": [{"language_queries": [
                {"query": "where did I put the knife"},
                {"query": ""},  # empty queries are dropped (reference)
                {"query": "who did I talk to"},
            ]}],
        }],
    }]}
    for name in ("nlq_val.json", "moments_val.json"):
        (root / name).write_text(json.dumps(anno))
    return str(root)


def test_nlq_dataset_video_and_text_modes(nlq_root):
    from egovlp_tpu.data.datasets import Ego4DNLQDataset, Ego4DMQDataset
    from egovlp_tpu.data.datasets.base import DatasetConfig

    base = dict(data_dir=nlq_root, meta_dir=nlq_root, split="val",
                num_frames=4, pre_size=32)
    vds = Ego4DNLQDataset(DatasetConfig(**base, subsample="video"))
    assert len(vds) == 1  # one clip
    item = vds.get(0, np.random.default_rng(0))
    # dense window: ceil(2.5 s * 1.87 fps * 4 frames) >= 16 frames
    assert item["frames"].shape[0] >= 16
    assert item["meta"]["clip_uid"] == "clip0"

    tds = Ego4DNLQDataset(DatasetConfig(**base, subsample="text"))
    assert len(tds) == 2  # empty query dropped
    assert tds.get(0, np.random.default_rng(0))["text"].startswith("where")

    mq = Ego4DMQDataset(DatasetConfig(**base))
    assert len(mq) == 1 and "frames" in mq.get(0, np.random.default_rng(0))


def test_cli_extract_end_to_end(nlq_root, tmp_path):
    """cli.extract video mode: config -> dense dataset -> micro-batched
    features written per clip_uid (the NLQ/MQ episodic-memory pipeline)."""
    import json as _json

    from egovlp_tpu.cli.extract import main as extract_main

    cfg = {
        "name": "nlq_extract_test",
        "task": "nlq",
        "arch": {"type": "FrozenInTime", "args": {
            "video_params": {"model": "SpaceTimeTransformer", "num_frames": 4,
                             "img_size": 32, "patch_size": 16, "embed_dim": 24,
                             "depth": 1, "num_heads": 2},
            "text_params": {"vocab_size": 32, "dim": 24, "n_layers": 1,
                            "n_heads": 2, "hidden_dim": 48,
                            "max_position_embeddings": 16, "max_length": 8},
            "projection": "minimal", "projection_dim": 8,
            "load_checkpoint": "",
        }},
        "data_loader": {"type": "Loader", "args": {
            "dataset_name": "Ego4D_NLQ",
            "data_dir": nlq_root, "meta_dir": nlq_root,
            "video_params": {"input_res": 32, "num_frames": 4,
                             "pre_size": 32},
        }},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps(cfg))
    out = tmp_path / "feats"
    extract_main(["--config", str(cfg_path), "--out", str(out),
                  "--subsample", "video", "--split", "val"])
    files = list(out.glob("*.npy"))
    assert files, "no features written"
    feats = np.load(files[0])
    assert feats.ndim == 2 and feats.shape[1] == 8  # [windows, proj_dim]
