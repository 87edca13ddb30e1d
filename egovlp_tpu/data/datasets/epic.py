"""EPIC-Kitchens-100 multi-instance retrieval dataset.

Behavioral reference: /root/reference/data_loader/EpicKitchens_MIR_dataset.py.
Metadata: EPIC_100_retrieval_{split}.csv (clips; col 2 = relative frame-dir
path, cols 6/7 = start/stop frame, col 8 = narration) plus the sentence csv
and the graded relevancy pickle.  Training captions are sampled from the
positives with relevancy > 0.1 and carry the relevancy weight used by the
adaptive max-margin loss.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np

from egovlp_tpu.data.datasets.base import TextVideoDataset
from egovlp_tpu.data.readers import read_frames_epic

RELEVANCY_THRESHOLD = 0.1


class EpicMIRDataset(TextVideoDataset):
    def _load_metadata(self):
        import pandas as pd

        split = self.cfg.split
        name = "train" if split == "train" else "test"
        self.metadata = pd.read_csv(
            os.path.join(self.cfg.meta_dir, f"EPIC_100_retrieval_{name}.csv")
        )
        self.metadata_sentence = pd.read_csv(
            os.path.join(self.cfg.meta_dir,
                         f"EPIC_100_retrieval_{name}_sentence.csv")
        )
        rel = os.path.join(
            self.cfg.meta_dir, "relevancy",
            f"caption_relevancy_EPIC_100_retrieval_{name}.pkl",
        )
        with open(rel, "rb") as f:
            self.relevancy_mat = pickle.load(f)

    def __len__(self):
        return len(self.metadata)

    def _caption(self, idx, sample, rng):
        """-> (sentence, relevancy weight, sentence idx).  Training picks a
        random positive with relevancy > 0.1 (reference :52-60)."""
        if self.cfg.split == "train":
            positives = np.where(
                self.relevancy_mat[idx] > RELEVANCY_THRESHOLD
            )[0]
            if len(positives):
                pos = int(rng.choice(positives))
                if pos < len(self.metadata_sentence) and pos < self.relevancy_mat.shape[1]:
                    return (
                        str(self.metadata_sentence.iloc[pos, 1]),
                        float(self.relevancy_mat[idx][pos]),
                        pos,
                    )
            return str(sample.iloc[8]), 1.0, 0
        return str(sample.iloc[8]), 1.0, -1

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, Any]:
        idx = idx % len(self.metadata)
        sample = self.metadata.iloc[idx]
        frame_dir = os.path.join(self.cfg.data_dir, str(sample.iloc[2]))
        start_f, stop_f = int(sample.iloc[6]), int(sample.iloc[7])
        text, relation, tidx = self._caption(idx, sample, rng)
        frames = self._decode_or_black(
            read_frames_epic, frame_dir, start_f, stop_f,
            self.cfg.num_frames, self.frame_sample,
            pre_size=self.cfg.pre_size, rng=rng,
        )
        return {
            "frames": frames,
            "text": text,
            "path": str(sample.iloc[2]),
            "relation": np.float32(relation),
            "item_v": np.int32(idx),
            "item_t": np.int32(tidx),
        }
