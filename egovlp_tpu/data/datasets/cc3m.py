"""Conceptual Captions 3M image-text dataset (legacy).

Behavioral reference: /root/reference/data_loader/ConceptualCaptions_dataset.py
(a TextImageDataset): tsv metadata with caption + file path; images are
treated as 1-frame videos.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from egovlp_tpu.data.datasets.base import TextVideoDataset
from egovlp_tpu.data.readers import read_image


class ConceptualCaptionsDataset(TextVideoDataset):
    def _load_metadata(self):
        import pandas as pd

        split = "train" if self.cfg.split == "train" else "val"
        path = os.path.join(self.cfg.meta_dir,
                            self.cfg.extra.get("metadata_file",
                                               f"cc3m_{split}.tsv"))
        self.metadata = pd.read_csv(path, sep="\t")

    def __len__(self):
        return len(self.metadata)

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, Any]:
        idx = idx % len(self.metadata)
        sample = self.metadata.iloc[idx]
        path = os.path.join(self.cfg.data_dir, str(sample.iloc[1]))
        try:
            frames = read_image(path, self.cfg.pre_size)
        except Exception:
            if self.cfg.loading == "strict":
                raise
            frames = np.zeros((1, self.cfg.pre_size, self.cfg.pre_size, 3),
                              np.uint8)
        return {"frames": frames, "text": str(sample.iloc[0])}
