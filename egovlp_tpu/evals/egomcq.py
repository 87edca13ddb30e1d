"""EgoMCQ multiple-choice evaluation.

Behavioral reference: trainer_egoclip.py:182-275 — per item, the query text
embedding against the 5 candidate video embeddings gives a 1x5 similarity
row; accuracy is grouped by type (metrics/egomcq.py).

TPU-native batching: the reference runs batch size 1 with 5 videos; here
the 5 options fold into the batch axis ([B, 5, T, H, W, 3] ->
[B*5, T, H, W, 3]) so the video tower always sees one static shape, and B
items are scored per jit call.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from egovlp_tpu.data.transforms import eval_resize
from egovlp_tpu.metrics.egomcq import egomcq_accuracy_metrics


@functools.partial(jax.jit, static_argnums=(0, 3))
def _mcq_scores(apply_fn, params, batch, input_res: int):
    frames = batch["frames_options"]  # [B, 5, T, H, W, 3] uint8
    B, O = frames.shape[:2]
    video = eval_resize(
        frames.reshape((B * O,) + frames.shape[2:]), out_size=input_res
    )
    v = apply_fn({"params": params}, video, method="encode_video",
                 deterministic=True)
    t = apply_fn({"params": params}, batch["text_ids"], batch["text_mask"],
                 method="encode_text", deterministic=True)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-8)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-8)
    v = v.reshape(B, O, -1)
    return jnp.einsum("bd,bod->bo", t, v)  # [B, 5]


def evaluate_egomcq(model, params, loader, input_res: int = 224,
                    progress: bool = False) -> Dict[str, float]:
    """loader yields batches with frames_options/text_ids/text_mask/
    correct/type.  Multi-process runs gather every process's scores before
    the metric (reference trainer_egoclip.py:224-234), so all hosts report
    full-dataset accuracies."""
    from egovlp_tpu.core.dist_eval import gather_eval

    preds, gts, types, idxs = [], [], [], []
    it = loader.epoch(0)
    if progress:
        import tqdm

        it = tqdm.tqdm(it, total=len(loader))
    for batch in it:
        scores = _mcq_scores(model.apply, params, {
            "frames_options": batch["frames_options"],
            "text_ids": batch["text_ids"],
            "text_mask": batch["text_mask"],
        }, input_res)
        preds.append(np.asarray(scores))
        gts.append(np.asarray(batch["correct"]))
        types.append(np.asarray(batch["type"]))
        idxs.append(np.asarray(batch["_index"]))
    g, _ = gather_eval(
        {"preds": np.concatenate(preds), "gts": np.concatenate(gts),
         "types": np.concatenate(types)},
        index=np.concatenate(idxs),
    )
    return egomcq_accuracy_metrics(g["preds"], g["gts"], g["types"])
