"""CharadesEgo video-level multi-label evaluation.

Behavioral reference: trainer_charades.py:167-250 / run/test_charades.py —
encode the 157 class sentences (from Charades_v1_classes.txt, stripping the
``cXXX `` prefix) once as the text side; per test video compute the cosine
similarity to every class embedding; 157-class mAP with empty-GT masking.
"""

from __future__ import annotations

import csv
from typing import Dict, List

import numpy as np

from egovlp_tpu.metrics.charades import charades_metrics
from egovlp_tpu.models.dual_encoder import sim_matrix
from egovlp_tpu.train.steps import make_text_embed_step, make_video_embed_step


def load_charades_classes(path: str) -> List[str]:
    """Charades_v1_classes.txt lines: 'c092 someone is ...' -> sentence."""
    out = []
    with open(path) as f:
        for line in csv.reader(f):
            out.append(line[0][5:])
    return out


def evaluate_charades(model, params, loader, class_sentences: List[str],
                      tokenizer, input_res: int = 224,
                      progress: bool = False, visualizer=None,
                      epoch: int = 0) -> Dict[str, float]:
    text_embed = make_text_embed_step()
    video_embed = make_video_embed_step(input_res)

    ids, mask = tokenizer(class_sentences)
    cls_embeds = np.asarray(text_embed(model.apply, params, ids, mask))

    vids, targets, paths = [], [], []
    it = loader.epoch(0)
    if progress:
        import tqdm

        it = tqdm.tqdm(it, total=len(loader))
    idxs = []
    for batch in it:
        v = video_embed(model.apply, params, batch["frames"])
        vids.append(np.asarray(v))
        targets.append(np.asarray(batch["target"]))
        paths.extend(batch.get("path", [""] * len(np.asarray(v))))
        idxs.append(np.asarray(batch["_index"]))

    # multi-process: gather all shards before the 157-class mAP
    # (reference trainer_charades.py:211-230 allgathers preds/gts)
    from egovlp_tpu.core.dist_eval import gather_eval

    g, gobj = gather_eval(
        {"vids": np.concatenate(vids), "targets": np.concatenate(targets)},
        index=np.concatenate(idxs), objects={"paths": paths},
    )
    vid_embeds, targets, paths = g["vids"], g["targets"], gobj["paths"]

    import jax.numpy as jnp

    sims = np.asarray(sim_matrix(jnp.asarray(cls_embeds),
                                 jnp.asarray(vid_embeds))).T  # [N, 157]
    if visualizer is not None:
        # per-class top videos; multi-label, so no single-GT highlighting
        visualizer.visualize_ranking(sims.T, epoch, class_sentences, paths,
                                     show_gt=False)
    return charades_metrics(sims, targets)
