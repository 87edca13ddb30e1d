"""Offline tooling + visualizer tests."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from egovlp_tpu.tools.charades_meta import build_metadata
from egovlp_tpu.tools.video_prep import chunk_video, resize_video
from egovlp_tpu.io.visualizer import RetrievalVisualizer
from tests.test_readers import make_video


def test_resize_video(tmp_path):
    src = make_video(tmp_path / "in.mp4", n_frames=10, size=(128, 64))
    dst = str(tmp_path / "out.mp4")
    resize_video(src, dst, short_side=32)
    cap = cv2.VideoCapture(dst)
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    assert min(h, w) == 32
    assert w % 2 == 0 and h % 2 == 0
    cap.release()


def test_chunk_video_short_copies(tmp_path):
    src = make_video(tmp_path / "in.mp4", n_frames=30, fps=30)
    chunk_video(src, str(tmp_path / "chunks"), chunk_sec=600)
    assert os.path.exists(tmp_path / "chunks" / "0.mp4")


def test_chunk_video_splits(tmp_path):
    src = make_video(tmp_path / "long.mp4", n_frames=90, fps=30)  # 3 s
    chunk_video(src, str(tmp_path / "chunks"), chunk_sec=1)
    files = sorted(os.listdir(tmp_path / "chunks"))
    assert len(files) >= 3
    cap = cv2.VideoCapture(str(tmp_path / "chunks" / "0.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 30
    cap.release()


def test_charades_meta(tmp_path):
    (tmp_path / "Charades_v1_classes.txt").write_text(
        "c092 someone is opening a door\nc101 a person sits down\n"
    )
    import pandas as pd

    pd.DataFrame({
        "id": ["VID01EGO", "VID02EGO"],
        "actions": ["c092 0.0 1.0;c101 0.5 1.5", ""],
    }).to_csv(tmp_path / "CharadesEgo_v1_train_only1st.csv", index=False)

    out = build_metadata(str(tmp_path), "train")
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 2  # empty actions row skipped
    assert df.iloc[0]["cls"] == "c092"
    assert df.iloc[0]["narration"] == "someone is opening a door"
    assert df.iloc[1]["t_start"] == 0.5


def test_visualizer(tmp_path, rng):
    vis = RetrievalVisualizer(str(tmp_path / "web"), num_samples=3, top_k=2)
    sims = rng.normal(size=(5, 5))
    page = vis.visualize_ranking(
        sims, epoch=1,
        queries=[f"query {i} <script>" for i in range(5)],
        paths=[f"vid{i}.mp4" for i in range(5)],
    )
    text = page.read_text()
    assert "GT rank" in text
    assert "&lt;script&gt;" in text  # escaped
    assert (tmp_path / "web" / "index.html").exists()
