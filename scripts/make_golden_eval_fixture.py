"""Generate the committed golden END-TO-END EgoMCQ eval fixture.

Extends the converter golden fixture (make_golden_fixtures.py) to one FULL
evaluation chain (VERDICT r2 item 6): synthetic 5-option MCQ items are
scored on the torch side with REFERENCE semantics end to end —

  uint8 frames -> /255 -> bilinear resize -> ImageNet normalize
  (utils/transforms in the reference eval pipelines)
  -> SpaceTimeTransformer oracle + DistilBert + projection heads
  (model/model.py:117-143) -> L2-normalized per-item 1x5 similarity rows
  (trainer_egoclip.py:182-275) -> type-grouped accuracies
  (model/metric.py:218-234)

— and the recorded scores/metrics are asserted in CI against this repo's
real eval path (Loader -> collate/channel-fold -> eval_resize ->
evaluate_egomcq) with the converted golden checkpoint.  Any drift anywhere
in the data->model->metric chain fails tests/test_golden_eval.py.

Run once (requires torch + transformers), then commit the npz:

    python scripts/make_golden_eval_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch
import torch.nn.functional as F

from torch_oracle import space_time_forward

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(HERE, "tests", "fixtures", "golden_dual_encoder.npz")
OUT = os.path.join(HERE, "tests", "fixtures", "golden_egomcq.npz")

# must match tests/test_golden_convert.py::CFG
VID = dict(dim=24, depth=2, heads=2, num_frames=4)
TXT = dict(vocab_size=100, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
           max_position_embeddings=48)
N_ITEMS, OPTIONS, T, PRE, RES, L = 8, 5, 4, 40, 32, 12

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def main():
    data = np.load(CKPT)
    sd = {k[len("sd/"):]: torch.tensor(data[k])
          for k in data.files if k.startswith("sd/")}
    vid_sd = {k[len("module.video_model."):]: v for k, v in sd.items()
              if k.startswith("module.video_model.")}
    txt_sd = {k[len("module.text_model."):]: v for k, v in sd.items()
              if k.startswith("module.text_model.")}

    from transformers import DistilBertConfig, DistilBertModel

    hf = DistilBertModel(DistilBertConfig(
        dropout=0.0, attention_dropout=0.0, **TXT)).eval()
    hf.load_state_dict(txt_sd)

    rng = np.random.default_rng(7)
    frames = rng.integers(
        0, 255, (N_ITEMS, OPTIONS, T, PRE, PRE, 3)).astype(np.uint8)
    ids = rng.integers(0, TXT["vocab_size"], (N_ITEMS, L)).astype(np.int32)
    mask = np.ones((N_ITEMS, L), np.int32)
    mask[:, L - 2:] = 0
    correct = rng.integers(0, OPTIONS, N_ITEMS).astype(np.int64)
    types = np.asarray([1, 2] * (N_ITEMS // 2), np.int64)  # intra/inter mix

    with torch.no_grad():
        # reference eval transform: /255 -> bilinear resize -> normalize
        x = torch.tensor(frames.astype(np.float32) / 255.0)
        x = x.permute(0, 1, 2, 5, 3, 4).reshape(-1, 3, PRE, PRE)
        x = F.interpolate(x, size=RES, mode="bilinear", align_corners=False)
        x = (x - torch.tensor(MEAN).view(1, 3, 1, 1)) / \
            torch.tensor(STD).view(1, 3, 1, 1)
        video = x.reshape(N_ITEMS * OPTIONS, T, 3, RES, RES)

        v_cls = space_time_forward(vid_sd, video, num_frames=T,
                                   heads=VID["heads"], depth=VID["depth"],
                                   patch_size=16)
        v_emb = v_cls @ sd["module.vid_proj.0.weight"].T + \
            sd["module.vid_proj.0.bias"]

        t_cls = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long)
                   ).last_hidden_state[:, 0]
        t_emb = F.relu(t_cls) @ sd["module.txt_proj.1.weight"].T + \
            sd["module.txt_proj.1.bias"]

        tn = F.normalize(t_emb, dim=1)
        vn = F.normalize(v_emb, dim=1).reshape(N_ITEMS, OPTIONS, -1)
        scores = torch.einsum("bd,bod->bo", tn, vn).numpy()

    # the committed metrics must be robust to f32-vs-bf16-free numerical
    # noise: require a clear argmax margin on every row
    top2 = np.sort(scores, axis=1)[:, -2:]
    margin = float(np.min(top2[:, 1] - top2[:, 0]))
    assert margin > 1e-3, f"ambiguous fixture (margin {margin}); reroll seed"

    metrics = {}
    for type_i, group in zip(np.unique(types), ("Intra-video", "Inter-video")):
        sel = types == type_i
        acc = float(np.mean(np.argmax(scores[sel], 1) == correct[sel]))
        metrics[group] = acc * 100.0

    np.savez_compressed(
        OUT, frames=frames, ids=ids, mask=mask, correct=correct,
        types=types, scores=scores,
        metric_intra=metrics["Intra-video"],
        metric_inter=metrics["Inter-video"],
    )
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1024:.1f} KiB); "
          f"margin {margin:.4f}; metrics {metrics}")


if __name__ == "__main__":
    main()
