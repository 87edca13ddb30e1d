"""16-frame CharadesEgo fine-tune rehearsal on the real chip through the
config-driven recipe path: synthetic charades corpus -> InfoNCE 16f train
with remat -> class-sentence mAP validation -> checkpoint."""
import json
import os
import sys
import tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def make_charades_corpus(root, n_videos=6):
    import cv2
    import pandas as pd

    rng = np.random.default_rng(0)
    train_rows, test_rows = [], []
    for vi in range(n_videos):
        vid = f"V{vi:03d}EGO"
        path = os.path.join(root, vid + ".mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (342, 256))
        base = rng.integers(0, 255, (256, 342, 3)).astype(np.uint8)
        for i in range(120):  # 4 s
            vw.write(np.roll(base, i * 3, axis=1))
        vw.release()
        for ci in range(3):
            train_rows.append({
                "id": vid,
                "narration": f"a person does action {ci} in scene {vi}",
                "cls": f"c{(vi * 3 + ci) % 157:03d}",
                "t_start": 0.3 * ci, "t_end": 0.3 * ci + 1.2,
            })
        test_rows.append({
            "id": vid, "subject": f"s{vi}", "scene": "room", "quality": 5,
            "relevance": 5, "verified": "Yes",
            "descriptions": f"a person does things in scene {vi}",
            "actions": ";".join(f"c{(vi * 3 + c) % 157:03d} {0.3 * c:.1f} "
                                f"{0.3 * c + 1.2:.1f}" for c in range(3)),
            "length": 4.0,
        })
    pd.DataFrame(train_rows).to_csv(os.path.join(root, "metadata_train.csv"),
                                    sep="\t", index=False)
    pd.DataFrame(test_rows).to_csv(
        os.path.join(root, "CharadesEgo_v1_test_only1st.csv"), index=False)
    with open(os.path.join(root, "Charades_v1_classes.txt"), "w") as f:
        for c in range(157):
            f.write(f"c{c:03d} class number {c}\n")


def main():
    from egovlp_tpu.io.config import Config
    from egovlp_tpu.train.recipes import run_task

    root = tempfile.mkdtemp(prefix="charades16_")
    make_charades_corpus(root)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "person", "does",
             "action", "actions", "in", "scene", "things", "room", "class",
             "number"] + [str(i) for i in range(160)]
    vp = os.path.join(root, "vocab.txt")
    open(vp, "w").write("\n".join(vocab))

    cfg = {
        "name": "charades16",
        "task": "charades",
        "arch": {"type": "FrozenInTime", "args": {
            "video_params": {"model": "SpaceTimeTransformer",
                             "num_frames": 16, "remat": True},
            "text_params": {"max_length": 30, "vocab": vp},
            "projection": "minimal", "projection_dim": 256,
            "load_checkpoint": "",
        }},
        "data_loader": {"type": "Loader", "args": {
            "dataset_name": "CharadesEgo",
            "data_dir": root, "meta_dir": root,
            "batch_size": 4, "num_workers": 8,
            "video_params": {"input_res": 224, "num_frames": 16,
                             "pre_size": 256, "loading": "lax"},
        }},
        "charades_classes": os.path.join(root, "Charades_v1_classes.txt"),
        "optimizer": {"type": "AdamW", "args": {"lr": 3e-5}},
        "loss": {"type": "NormSoftmaxLoss", "args": {}},
        "metrics": ["charades_map"],
        "trainer": {"epochs": 1, "save_dir": os.path.join(root, "results"),
                    "save_period": 1, "monitor": "max mAP",
                    "early_stop": 5, "init_val": False,
                    "lr_milestones": [60, 80], "val_batch_size": 2,
                    "async_save": True},
    }
    state = run_task(Config(cfg))
    print(f"CHARADES16 REHEARSAL OK step={int(state.step)}", flush=True)


if __name__ == "__main__":
    main()
