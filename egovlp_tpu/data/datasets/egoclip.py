"""EgoClip pretraining and EgoMCQ evaluation datasets.

Behavioral reference: /root/reference/data_loader/EgoClip_EgoMCQ_dataset.py.

EgoClip (train): tab-separated ``egoclip.csv`` of 3.85M narrated clips.
Videos are stored as 600-second chunk files ``{video_uid}/{chunk}.mp4``.
Captions carry Ego4D taxonomy tags -> (noun one-hot dim 582, verb one-hot
dim 118) used by the EgoNCE masks.  ``neg_param`` (seconds) enables
scene-aware hard negatives: another narration from the same
``video_uid_{narration_time // neg_param}`` segment.

EgoMCQ (val/test): ``egomcq.json`` items with 1 text query, 5 candidate
clips, the correct index and the inter/intra ``types`` id.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from egovlp_tpu.data.datasets.base import TextVideoDataset
from egovlp_tpu.data.readers import CHUNK_SEC, read_frames_egoclip

NOUN_DIM = 582
VERB_DIM = 118


def _tag_vec(tag_str: str, dim: int) -> np.ndarray:
    """Parse '[1, 5]'-style taxonomy tags into a one-hot vector."""
    vec = np.zeros(dim, np.float32)
    try:
        ids = json.loads(tag_str) if isinstance(tag_str, str) else tag_str
    except (ValueError, TypeError):
        ids = []
    for i in np.atleast_1d(ids):
        i = int(i)
        if 0 <= i < dim:
            vec[i] = 1.0
    return vec


class EgoClipDataset(TextVideoDataset):
    def _load_metadata(self):
        import pandas as pd

        path = os.path.join(self.cfg.meta_dir, "egoclip.csv")
        self.metadata = pd.read_csv(path, sep="\t", on_bad_lines="skip")
        if self.cfg.neg_param:
            self.metadata["chunk_id"] = (
                self.metadata["narration_time"] // self.cfg.neg_param
            ).astype(str)
            self.metadata["segment_id"] = (
                self.metadata["video_uid"] + "_" + self.metadata["chunk_id"]
            )
            self._segment_groups = self.metadata.groupby("segment_id").indices

    def __len__(self):
        return len(self.metadata)

    def _clip_paths(self, sample):
        start = max(float(sample["clip_start"]), 0.0)
        end = max(float(sample["clip_end"]), 0.0)
        c0 = int(start // CHUNK_SEC)
        c1 = int(end // CHUNK_SEC)
        fp0 = os.path.join(self.cfg.data_dir, sample["video_uid"], f"{c0}.mp4")
        fp1 = os.path.join(self.cfg.data_dir, sample["video_uid"], f"{c1}.mp4")
        bound = (c0 + 1) * CHUNK_SEC
        return (fp0, fp1), (start, end), bound

    def _read_clip(self, sample, rng):
        (fp0, fp1), (start, end), bound = self._clip_paths(sample)
        return self._decode_or_black(
            read_frames_egoclip, fp0, fp1, self.cfg.num_frames,
            self.frame_sample, start, end, bound,
            pre_size=self.cfg.pre_size, rng=rng,
            backend=self.cfg.reader_backend,
        )

    def _caption(self, sample):
        return (
            str(sample["clip_text"]),
            _tag_vec(sample["tag_noun"], NOUN_DIM),
            _tag_vec(sample["tag_verb"], VERB_DIM),
        )

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, Any]:
        idx = idx % len(self.metadata)
        sample = self.metadata.iloc[idx]
        text, noun_vec, verb_vec = self._caption(sample)
        item = {
            "frames": self._read_clip(sample, rng),
            "text": text,
            "noun_vec": noun_vec,
            "verb_vec": verb_vec,
        }
        if self.cfg.neg_param:
            group = self._segment_groups[sample["segment_id"]]
            neg = self.metadata.iloc[int(rng.choice(group))]
            text_n, noun_n, verb_n = self._caption(neg)
            item.update(
                frames_neg=self._read_clip(neg, rng),
                text_neg=text_n,
                noun_vec_neg=noun_n,
                verb_vec_neg=verb_n,
            )
        return item


class EgoMCQDataset(TextVideoDataset):
    NUM_OPTIONS = 5

    def _load_metadata(self):
        path = os.path.join(self.cfg.meta_dir, "egomcq.json")
        with open(path) as f:
            self.metadata = json.load(f)
        self._keys = sorted(self.metadata.keys(), key=lambda k: int(k))

    def __len__(self):
        return len(self._keys)

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, Any]:
        item = self.metadata[self._keys[idx % len(self._keys)]]
        query = str(item["query"]["clip_text"])
        options = item["choices"]
        videos = np.zeros(
            (self.NUM_OPTIONS, self.cfg.num_frames, self.cfg.pre_size,
             self.cfg.pre_size, 3), np.uint8,
        )
        helper = EgoClipDataset.__new__(EgoClipDataset)
        helper.cfg = self.cfg
        # output slots follow insertion order, like the reference's dict
        # iteration (:140) — but DECODE in (video, chunk, start) order:
        # same-chunk options then hit the decoder's sequential forward
        # fast path instead of re-seeking and re-rolling the GOP per
        # option (the val sampler is deterministic, so decode order can't
        # change the frames; measured with scripts/mcq_eval_profile.py)
        keys = list(options.keys())
        texts = [str(options[k]["clip_text"]) for k in keys]
        decode_order = sorted(
            range(len(keys)),
            key=lambda i: (str(options[keys[i]]["video_uid"]),
                           float(options[keys[i]].get("clip_start", 0.0))),
        ) if self.frame_sample != "rand" else range(len(keys))
        for i in decode_order:
            videos[i] = helper._read_clip(options[keys[i]], rng)
        return {
            "frames_options": videos,
            "text": query,
            "text_options": texts,
            "correct": int(item["answer"]),
            "type": int(item["types"]),
        }
