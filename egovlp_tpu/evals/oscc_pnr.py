"""Ego4D OSCC / PNR evaluation.

Behavioral reference: trainer_oscc.py:436-459 (binary accuracy over the
2-logit head) and trainer_pnr.py:441-474 (keyframe-distance over the
16-logit head with the clip fps / parent frame bounds).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from egovlp_tpu.metrics.oscc_pnr import oscc_metrics, pnr_metrics
from egovlp_tpu.train.steps import make_video_embed_step


def _collect_logits(model, params, loader, input_res, keys, progress=False):
    """Per-shard logits + label columns, gathered across processes before
    the metric (reference trainer_pnr.py:449-455 allgathers preds/gts)."""
    from egovlp_tpu.core.dist_eval import gather_eval

    video_embed = make_video_embed_step(input_res)
    logits, extras = [], {k: [] for k in keys}
    idxs = []
    it = loader.epoch(0)
    if progress:
        import tqdm

        it = tqdm.tqdm(it, total=len(loader))
    for batch in it:
        logits.append(np.asarray(
            video_embed(model.apply, params, batch["frames"])
        ))
        for k in keys:
            extras[k].append(np.asarray(batch[k]))
        idxs.append(np.asarray(batch["_index"]))
    cols = {"logits": np.concatenate(logits)}
    cols.update({k: np.concatenate(v) for k, v in extras.items()})
    g, _ = gather_eval(cols, index=np.concatenate(idxs))
    return g.pop("logits"), g


def evaluate_oscc(model, params, loader, input_res: int = 224,
                  progress: bool = False) -> Dict[str, float]:
    logits, ex = _collect_logits(model, params, loader, input_res,
                                 ("state",), progress)
    return oscc_metrics(logits, ex["state"])


def evaluate_pnr(model, params, loader, input_res: int = 224,
                 progress: bool = False) -> Dict[str, float]:
    keys = ("labels", "state", "fps", "parent_start_frame",
            "parent_end_frame", "parent_pnr_frame")
    logits, ex = _collect_logits(model, params, loader, input_res, keys,
                                 progress)
    return pnr_metrics(
        logits, ex["labels"], ex["state"], ex["fps"],
        ex["parent_start_frame"], ex["parent_end_frame"],
        ex["parent_pnr_frame"],
    )
