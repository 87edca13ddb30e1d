"""Dataset base: host-side metadata + frame extraction.

Unlike the reference (torch Dataset subclasses entangled with torchvision
transforms, /root/reference/base/base_dataset.py), datasets here emit plain
numpy items — fixed-shape uint8 frames plus metadata — and ALL pixel math
runs on-device (egovlp_tpu/data/transforms.py).  Items carry an explicit
RNG so workers are reproducible.

Common behaviors kept from the reference:
  * ``loading='lax'`` substitutes black frames when decode fails
    (base_dataset.py:109-115);
  * train split samples frames randomly, val/test uniformly (:96-98);
  * static output shape [num_frames, pre_size, pre_size, 3].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import numpy as np


@dataclasses.dataclass
class DatasetConfig:
    data_dir: str = ""
    meta_dir: Optional[str] = None
    split: str = "train"
    num_frames: int = 4
    pre_size: int = 256
    input_res: int = 224
    loading: str = "strict"  # 'strict' | 'lax'
    reader_backend: str = "auto"
    neg_param: Optional[int] = None   # EgoClip scene-negative window (sec)
    subsample: Any = 1                # NLQ: 'video'|'text'; others: frac
    max_samples: Optional[int] = None
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        self.data_dir = os.path.expandvars(self.data_dir)
        self.meta_dir = os.path.expandvars(self.meta_dir or self.data_dir)


class TextVideoDataset:
    """Minimal dataset protocol: __len__ + get(idx, rng) -> dict."""

    def __init__(self, cfg: DatasetConfig):
        self.cfg = cfg
        self._load_metadata()

    # -- subclass hooks ------------------------------------------------
    def _load_metadata(self):
        raise NotImplementedError

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, Any]:
        raise NotImplementedError

    # -- helpers --------------------------------------------------------
    @property
    def frame_sample(self) -> str:
        return "rand" if self.cfg.split == "train" else "uniform"

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx: int):
        return self.get(idx, np.random.default_rng(idx))

    def _black_frames(self) -> np.ndarray:
        return np.zeros(
            (self.cfg.num_frames, self.cfg.pre_size, self.cfg.pre_size, 3),
            np.uint8,
        )

    # -- test-time sliding-window expansion ------------------------------
    def expand_temporal_windows(self, vlens, stride: int):
        """Sliding-window test-time expansion (reference
        base_dataset.py:76-83 `_fix_temporal_samples`): each video of
        ``vlen`` frames becomes multiple items with ``fix_start`` offsets
        0, stride, 2*stride, ... within one sampling interval.

        Returns a list of (orig_index, fix_start) pairs; datasets that
        support it remap item indices through this list and pass the
        fix_start to their reader."""
        assert self.cfg.split == "test", (
            "sliding-window sampling is test-time only"
        )
        out = []
        for i, vlen in enumerate(vlens):
            acc = min(vlen, self.cfg.num_frames)
            interval = max(int(vlen / max(acc, 1)), 1)
            for fs in range(0, interval, stride):
                out.append((i, fs))
        return out

    def _decode_or_black(self, fn, *args, **kw) -> np.ndarray:
        """Run a reader; on failure follow the loading policy."""
        try:
            frames, _ = fn(*args, **kw)
            return frames
        except Exception as e:
            if self.cfg.loading == "strict":
                raise ValueError(f"video loading failed ({e}); "
                                 "loading for this dataset is strict") from e
            return self._black_frames()
