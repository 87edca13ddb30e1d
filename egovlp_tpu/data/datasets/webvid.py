"""WebVid-2M video-text dataset (legacy Frozen-in-Time pretraining data).

Behavioral reference: /root/reference/data_loader/WebVid_dataset.py —
``results_{cut}_{split}.csv`` metadata with ``videoid`` / ``name`` columns
and mp4 files under ``{data_dir}/videos``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from egovlp_tpu.data.datasets.base import TextVideoDataset
from egovlp_tpu.data.readers import get_video_len, read_frames


class WebVidDataset(TextVideoDataset):
    def _load_metadata(self):
        import pandas as pd

        cut = self.cfg.extra.get("cut", "2M")
        split = "train" if self.cfg.split == "train" else "val"
        path = os.path.join(self.cfg.meta_dir, "metadata",
                            f"results_{cut}_{split}.csv")
        self.metadata = pd.read_csv(path)
        if isinstance(self.cfg.subsample, (int, float)) and self.cfg.subsample < 1:
            self.metadata = self.metadata.sample(frac=self.cfg.subsample)

    def _video_path(self, sample) -> str:
        rel = os.path.join("videos", str(sample["videoid"]) + ".mp4")
        return os.path.join(self.cfg.data_dir, rel)

    def _video_lens(self):
        return [get_video_len(self._video_path(row),
                              self.cfg.reader_backend)
                for _, row in self.metadata.iterrows()]

    def __len__(self):
        return self._expanded_len(len(self.metadata))

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, Any]:
        idx, fix_start = self._resolve_index(idx, len(self.metadata))
        sample = self.metadata.iloc[idx]
        frames = self._decode_or_black(
            read_frames, self._video_path(sample),
            self.cfg.num_frames, self.frame_sample, fix_start=fix_start,
            pre_size=self.cfg.pre_size, rng=rng,
            backend=self.cfg.reader_backend,
        )
        return {"frames": frames, "text": str(sample["name"])}
