"""Production rehearsal on the real chip: full-size EgoVLP dual encoder
through the config-driven recipe path (cli surface) on a synthetic EgoClip
corpus — train 2 epochs with scene negatives + EgoNCE, EgoMCQ validation,
checkpointing, then RESUME for one more epoch from the saved checkpoint."""
import glob
import json
import os
import sys
import tempfile
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here)); sys.path.insert(0, _here)
import numpy as np


def main():
    from e2e_throughput import make_corpus
    from egovlp_tpu.io.config import Config
    from egovlp_tpu.train.recipes import run_task

    root = tempfile.mkdtemp(prefix="rehearsal_")
    make_corpus(root, n_videos=12)  # 120 clips, real mp4 decode path
    # EgoMCQ val items over the same corpus
    mcq = {}
    for q in range(8):
        vid = f"vid_{q % 12}"
        mcq[str(q)] = {
            "query": {"video_uid": vid, "clip_start": 0.3, "clip_end": 1.2,
                      "clip_text": f"#C C does action {q % 10} in video {q % 12}"},
            "choices": {str(i): {"video_uid": f"vid_{(q + i) % 12}",
                                 "clip_start": 0.2 + 0.4 * i,
                                 "clip_end": 1.0 + 0.4 * i,
                                 "clip_text": f"#C C does action {i} in video {(q + i) % 12}"}
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

    save = os.path.join(root, "results")
    cfg = {
        "name": "rehearsal",
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
        "trainer": {"epochs": 2, "max_samples_per_epoch": 64,
                    "save_dir": save, "save_period": 1,
                    "monitor": "max Inter-video", "early_stop": 10,
                    "init_val": False, "lr_milestones": [60, 80],
                    "val_batch_size": 4},
    }
    state = run_task(Config(dict(cfg)))
    print(f"REHEARSAL TRAIN DONE step={int(state.step)}", flush=True)

    ckpts = sorted(glob.glob(os.path.join(save, "models", "rehearsal", "*",
                                          "checkpoint-epoch*")))
    assert ckpts, "no checkpoint saved"
    cfg["trainer"]["epochs"] = 3
    state2 = run_task(Config(dict(cfg)), resume=ckpts[-1])
    print(f"REHEARSAL RESUME DONE step={int(state2.step)}", flush=True)
    assert int(state2.step) > int(state.step)
    print("REHEARSAL OK", flush=True)


if __name__ == "__main__":
    main()
