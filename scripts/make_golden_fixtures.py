"""Generate the committed golden conversion fixture.

Produces ``tests/fixtures/golden_dual_encoder.npz``: a tiny (2-block,
small-dim) reference-format checkpoint plus REFERENCE-SEMANTICS outputs
computed on the torch side (the functional SpaceTimeTransformer oracle for
the video tower, HuggingFace DistilBertModel for the text tower, and the
reference's 'minimal' projection heads: txt_proj = Sequential(ReLU, Linear),
vid_proj = Sequential(Linear); /root/reference/model/model.py:72-79,
117-143).

The paired test (tests/test_golden_convert.py) runs WITHOUT torch: it
converts the committed checkpoint with `dual_encoder_params` and asserts
the Flax dual encoder reproduces the recorded embeddings — pinning the
converter mapping and model semantics in CI without the 1.7 GB egovlp.pth.

Run once (requires torch + transformers), then commit the npz:

    python scripts/make_golden_fixtures.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch
import torch.nn.functional as F

from torch_oracle import random_space_time_state_dict, space_time_forward

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_dual_encoder.npz")

# Tiny-but-structured shapes: 2 video blocks, 2 text layers, uneven dims so
# any transposition mistake changes shapes.
VID = dict(dim=24, depth=2, heads=2, num_frames=4, patches_per_frame=4)
TXT = dict(vocab_size=100, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
           max_position_embeddings=48)
PROJ = 8
B, L, RES = 2, 12, 32


def main():
    rng = np.random.default_rng(42)
    torch.manual_seed(42)

    vid_sd = random_space_time_state_dict(rng, **VID)

    from transformers import DistilBertConfig, DistilBertModel

    hf = DistilBertModel(DistilBertConfig(
        dropout=0.0, attention_dropout=0.0, **TXT)).eval()
    txt_sd = hf.state_dict()

    w_t = torch.tensor(rng.normal(scale=0.05, size=(PROJ, TXT["dim"])),
                       dtype=torch.float32)
    b_t = torch.tensor(rng.normal(scale=0.05, size=PROJ), dtype=torch.float32)
    w_v = torch.tensor(rng.normal(scale=0.05, size=(PROJ, VID["dim"])),
                       dtype=torch.float32)
    b_v = torch.tensor(rng.normal(scale=0.05, size=PROJ), dtype=torch.float32)

    # reference-format flat checkpoint, DataParallel-prefixed like a real
    # trainer save (base_trainer.py:399-422)
    sd = {}
    for k, v in vid_sd.items():
        sd[f"module.video_model.{k}"] = v.numpy()
    for k, v in txt_sd.items():
        sd[f"module.text_model.{k}"] = v.numpy()
    sd["module.txt_proj.1.weight"] = w_t.numpy()
    sd["module.txt_proj.1.bias"] = b_t.numpy()
    sd["module.vid_proj.0.weight"] = w_v.numpy()
    sd["module.vid_proj.0.bias"] = b_v.numpy()

    video = rng.normal(size=(B, VID["num_frames"], RES, RES, 3)).astype(
        np.float32)
    ids = rng.integers(0, TXT["vocab_size"], size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[:, L - 3:] = 0  # exercise padding

    with torch.no_grad():
        t_cls = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long)
                   ).last_hidden_state[:, 0]
        t_emb = F.relu(t_cls) @ w_t.T + b_t          # Sequential(ReLU, Linear)
        v_cls = space_time_forward(
            vid_sd, torch.tensor(video).permute(0, 1, 4, 2, 3),
            num_frames=VID["num_frames"], heads=VID["heads"],
            depth=VID["depth"], patch_size=16)
        v_emb = v_cls @ w_v.T + b_v                  # Sequential(Linear)

    payload = {f"sd/{k}": v for k, v in sd.items()}
    payload.update({
        "in/video": video, "in/ids": ids, "in/mask": mask,
        "out/t": t_emb.numpy(), "out/v": v_emb.numpy(),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **payload)
    size = os.path.getsize(OUT)
    print(f"wrote {OUT} ({size / 1024:.1f} KiB, {len(sd)} checkpoint keys)")


if __name__ == "__main__":
    main()
