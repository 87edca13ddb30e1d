"""Ego4D NLQ / MQ dense-feature extraction datasets.

Behavioral reference: /root/reference/data_loader/Ego4D_{NLQ,MQ}_dataset.py.
These feed the feature extractors (run/test_nlq.py, test_mq.py): whole
episodic-memory clips decoded densely at 1.87 fps, reshaped downstream into
``num_frames`` windows; NLQ additionally has a text mode yielding the
language queries.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from egovlp_tpu.data.datasets.base import TextVideoDataset
from egovlp_tpu.data.readers import open_video
from egovlp_tpu.data.samplers import sample_frames_clips

FEATURE_FPS = 1.87  # reference test_nlq.py:?? — dense sampling rate


class Ego4DNLQDataset(TextVideoDataset):
    split_files = {
        "train": "nlq_train.json",
        "val": "nlq_val.json",
        "test": "nlq_test_unannotated.json",
    }

    def _load_metadata(self):
        assert self.cfg.subsample in ("video", "text"), (
            "NLQ/MQ datasets require subsample='video'|'text'"
        )
        path = os.path.join(self.cfg.meta_dir, self.split_files[self.cfg.split])
        with open(path) as f:
            anno = json.load(f)

        rows = []
        for video in anno["videos"]:
            for clip in video["clips"]:
                base = {
                    "video_uid": video["video_uid"],
                    "clip_uid": clip["clip_uid"],
                    "video_start_sec": float(clip["video_start_sec"]),
                    "video_end_sec": float(clip["video_end_sec"]),
                }
                if self.cfg.subsample == "video":
                    rows.append(base)
                else:
                    for ann in clip.get("annotations", []):
                        for q in ann.get("language_queries", []):
                            if q.get("query"):
                                rows.append({**base, "query": q["query"]})
        self.metadata = rows

    def __len__(self):
        return len(self.metadata)

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, Any]:
        sample = self.metadata[idx % len(self.metadata)]
        meta = {
            "video_uid": sample["video_uid"],
            "clip_uid": sample["clip_uid"],
        }
        if self.cfg.subsample == "text":
            return {"text": str(sample["query"]), "meta": meta}

        video_fp = os.path.join(self.cfg.data_dir,
                                sample["video_uid"] + ".mp4")
        start_f = sample["video_start_sec"] * 30
        end_f = sample["video_end_sec"] * 30
        n_dense = int(
            (sample["video_end_sec"] - sample["video_start_sec"])
            * FEATURE_FPS * self.cfg.num_frames
        )
        n_dense = max(n_dense, self.cfg.num_frames)
        with open_video(video_fp, self.cfg.reader_backend) as v:
            idxs = sample_frames_clips(int(start_f), int(end_f),
                                       max(v.frame_count, 1), n_dense)
            frames, _ = v.read_frames(idxs, self.cfg.pre_size)
        return {"frames": frames, "meta": meta}


class Ego4DMQDataset(Ego4DNLQDataset):
    split_files = {
        "train": "moments_train.json",
        "val": "moments_val.json",
        "test": "moments_test_unannotated.json",
    }

    def _load_metadata(self):
        # MQ is video-only (reference Ego4D_MQ_dataset.py)
        self.cfg.subsample = "video"
        super()._load_metadata()
