"""Chip soak (VERDICT r3 #8): resume bit-equality on the full recipe path.

Two runs of the config-driven EgoClip recipe (`train.recipes.run_task`, the
same path `cli.train` drives) over a synthetic 600 s-chunk corpus:

  A. 2 epochs uninterrupted;
  B. 1 epoch -> checkpoint -> fresh `run_task(resume=...)` to epoch 2,
     i.e. a mid-run interruption + restart.

Asserts the final PARAMS and OPTIMIZER MOMENTS of B bit-match A
(np.array_equal per leaf).  This exercises the trainer/checkpoint/loader
interaction end-to-end on the real chip: deterministic per-epoch sample
order (seeded DistributedSampler semantics), explicit per-item decode RNG,
step-keyed dropout folds, and Orbax save/restore of step + monitor state.

The reference has no such guarantee (torch DataLoader workers + CUDA
nondeterminism); bit-exact resume is a TPU-native capability the framework
pins here and in tests/test_trainer.py's CPU variant.

Run:  nohup python scripts/soak_resume.py > /tmp/soak.log 2>&1 &
"""
import glob
import json
import os
import sys
import tempfile
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def _mcq_items(root, n_videos):
    mcq = {}
    for q in range(8):
        vid = f"vid_{q % n_videos}"
        mcq[str(q)] = {
            "query": {"video_uid": vid, "clip_start": 0.3, "clip_end": 1.2,
                      "clip_text": f"#C C does action {q % 10}"},
            "choices": {str(i): {"video_uid": f"vid_{(q + i) % n_videos}",
                                 "clip_start": 0.2 + 0.4 * i,
                                 "clip_end": 1.0 + 0.4 * i,
                                 "clip_text": f"#C C does action {i}"}
                        for i in range(5)},
            "answer": q % 5,
            "types": 1 + q % 2,
        }
    with open(os.path.join(root, "egomcq.json"), "w") as f:
        json.dump(mcq, f)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "#", "c", "does", "action",
             "in", "video"] + [str(i) for i in range(20)]
    vp = os.path.join(root, "vocab.txt")
    with open(vp, "w") as f:
        f.write("\n".join(vocab))
    return vp


def _cfg(root, vp, save, epochs):
    return {
        "name": "soak",
        "task": "egoclip",
        "arch": {"type": "FrozenInTime", "args": {
            "video_params": {"model": "SpaceTimeTransformer",
                             "num_frames": 4},
            "text_params": {"max_length": 30, "vocab": vp},
            "projection": "minimal", "projection_dim": 256,
            "load_checkpoint": "",
        }},
        "data_loader": {"type": "Loader", "args": {
            "dataset_name": "EgoClip_EgoMCQ",
            "data_dir": root, "meta_dir": root,
            "batch_size": 8, "num_workers": 8, "neg_param": 60,
            "video_params": {"input_res": 224, "num_frames": 4,
                             "pre_size": 256, "loading": "lax"},
        }},
        "optimizer": {"type": "AdamW", "args": {"lr": 3e-5}},
        "loss": {"type": "EgoNCE", "args": {}},
        "metrics": ["egomcq_accuracy_metrics"],
        "trainer": {"epochs": epochs, "max_samples_per_epoch": 64,
                    "save_dir": save, "save_period": 1,
                    "monitor": "max Inter-video", "early_stop": 10,
                    "init_val": False, "lr_milestones": [60, 80],
                    "val_batch_size": 4},
    }


def _leaves(tree):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def main():
    from e2e_throughput import make_corpus

    from egovlp_tpu.io.config import Config
    from egovlp_tpu.train.recipes import run_task

    root = tempfile.mkdtemp(prefix="soak_")
    make_corpus(root, n_videos=12)
    vp = _mcq_items(root, 12)

    t0 = time.time()
    # --- run A: 2 epochs straight through
    state_a = run_task(Config(_cfg(root, vp, os.path.join(root, "ra"), 2)))
    print(f"A done step={int(state_a.step)} ({time.time()-t0:.0f}s)",
          flush=True)
    pa, oa = _leaves(state_a.params), _leaves(state_a.opt_state)

    # --- run B: 1 epoch, checkpoint, then a fresh resume to epoch 2
    save_b = os.path.join(root, "rb")
    state_b1 = run_task(Config(_cfg(root, vp, save_b, 1)))
    print(f"B leg 1 done step={int(state_b1.step)}", flush=True)
    ckpts = sorted(glob.glob(os.path.join(save_b, "models", "soak", "*",
                                          "checkpoint-epoch*")))
    assert ckpts, "no checkpoint saved after epoch 1"
    state_b = run_task(Config(_cfg(root, vp, save_b, 2)), resume=ckpts[-1])
    print(f"B resumed done step={int(state_b.step)}", flush=True)
    pb, ob = _leaves(state_b.params), _leaves(state_b.opt_state)

    assert int(state_a.step) == int(state_b.step), (state_a.step,
                                                    state_b.step)
    n_param_mismatch = sum(
        0 if np.array_equal(a, b) else 1 for a, b in zip(pa, pb))
    n_opt_mismatch = sum(
        0 if np.array_equal(a, b) else 1 for a, b in zip(oa, ob))
    worst = 0.0
    for a, b in zip(pa, pb):
        if a.size and not np.array_equal(a, b):
            worst = max(worst, float(np.max(np.abs(
                a.astype(np.float64) - b.astype(np.float64)))))
    print(json.dumps({
        "metric": "soak_resume_bitmatch",
        "steps": int(state_a.step),
        "param_leaves": len(pa),
        "param_leaf_mismatches": n_param_mismatch,
        "opt_leaf_mismatches": n_opt_mismatch,
        "worst_abs_diff": worst,
        "ok": n_param_mismatch == 0 and n_opt_mismatch == 0,
    }), flush=True)
    assert n_param_mismatch == 0 and n_opt_mismatch == 0, \
        "resume diverged from uninterrupted training"
    print("SOAK OK", flush=True)


if __name__ == "__main__":
    main()
