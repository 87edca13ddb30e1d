"""Checkpoint-conversion parity probe.

Given a real torch checkpoint (the published `egovlp.pth`, a timm ViT file,
or an HF DistilBERT `pytorch_model.bin`), converts it and compares the Flax
towers' outputs against independent torch oracles on random inputs —
the activation-level check that de-risks published-number parity before
running a full evaluation.

    python scripts/parity_probe.py --checkpoint pretrained/egovlp.pth \
        [--num_frames 4] [--batch 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(checkpoint: str, num_frames: int = 4, batch: int = 2) -> bool:
    """Run the activation-level parity checks; returns overall pass/fail."""
    import types

    args = types.SimpleNamespace(checkpoint=checkpoint,
                                 num_frames=num_frames, batch=batch)

    import jax
    import jax.numpy as jnp
    import torch

    from egovlp_tpu.models import (
        DistilBert,
        DualEncoder,
        DualEncoderConfig,
        SpaceTimeTransformer,
        TextTowerConfig,
        VideoTowerConfig,
    )
    from egovlp_tpu.models.convert import (
        dual_encoder_params,
        load_torch_weights,
        strip_data_parallel_prefix,
        text_tower_params,
        video_tower_params,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from torch_oracle import space_time_forward

    sd = strip_data_parallel_prefix(load_torch_weights(args.checkpoint))
    keys = set(sd)
    rng = np.random.default_rng(0)
    vcfg = VideoTowerConfig(num_frames=args.num_frames,
                            attention_impl="xla")
    B, T, R = args.batch, args.num_frames, 224

    results = []

    def report(name, got, want, tol=2e-2):
        """f32 reassociation between torch (oneDNN) and XLA legitimately
        drifts ~1e-2 relative at depth 12; what retrieval metrics care
        about is directional alignment, so report cosine too."""
        got = np.asarray(got, np.float64)
        want = np.asarray(want, np.float64)
        diff = float(np.max(np.abs(got - want)))
        rel = diff / (float(np.abs(want).max()) + 1e-9)
        g = got.reshape(got.shape[0], -1)
        w = want.reshape(want.shape[0], -1)
        cos = float(np.min(np.sum(g * w, -1) / (
            np.linalg.norm(g, axis=-1) * np.linalg.norm(w, axis=-1) + 1e-9)))
        ok = rel < tol and cos > 0.9999
        results.append(ok)
        print(f"[{'OK ' if ok else 'FAIL'}] {name}: max abs diff {diff:.3e} "
              f"(rel {rel:.3e}), min cosine {cos:.6f}")

    has_video = any(k.startswith("video_model.") for k in keys) or \
        "patch_embed.proj.weight" in keys
    has_text = any(k.startswith("text_model.") for k in keys) or \
        "embeddings.word_embeddings.weight" in keys

    if has_video:
        vid_sd = ({k[len("video_model."):]: v for k, v in sd.items()
                   if k.startswith("video_model.")}
                  or sd)
        if "temporal_embed" in vid_sd:
            # run the oracle at the checkpoint's own frame count
            ck_frames = vid_sd["temporal_embed"].shape[1]
        else:
            ck_frames = args.num_frames
        vcfg_ck = VideoTowerConfig(num_frames=ck_frames, attention_impl="xla")
        model = SpaceTimeTransformer(vcfg_ck)
        video = rng.normal(size=(B, ck_frames, R, R, 3)).astype(np.float32)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.asarray(video))["params"]
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template)
        params = video_tower_params(vid_sd, vcfg_ck, template)
        got = model.apply({"params": params}, jnp.asarray(video))
        tsd = {k: torch.tensor(np.ascontiguousarray(v))
               for k, v in vid_sd.items()}
        if "temporal_embed" not in tsd:
            tsd["temporal_embed"] = torch.zeros(1, ck_frames, 768)
            for i in range(12):
                for nm, shape in (("qkv.weight", (2304, 768)),
                                  ("qkv.bias", (2304,)),
                                  ("proj.weight", (768, 768)),
                                  ("proj.bias", (768,))):
                    k = f"blocks.{i}.timeattn.{nm}"
                    if k not in tsd:
                        t = torch.zeros(*shape)
                        if nm == "proj.weight":
                            t.fill_(1.0)
                        tsd[k] = t
                for ln in ("norm3.weight",):
                    tsd.setdefault(f"blocks.{i}.{ln}", torch.ones(768))
                tsd.setdefault(f"blocks.{i}.norm3.bias", torch.zeros(768))
        with torch.no_grad():
            want = space_time_forward(
                tsd, torch.tensor(video).permute(0, 1, 4, 2, 3),
                num_frames=ck_frames, heads=12, depth=12)
        report(f"video tower CLS ({ck_frames}f)", got, want.numpy())

    if has_text:
        txt_sd = ({k[len("text_model."):]: v for k, v in sd.items()
                   if k.startswith("text_model.")}
                  or {k.removeprefix("distilbert."): v for k, v in sd.items()})
        from transformers import DistilBertConfig, DistilBertModel

        tcfg = TextTowerConfig()
        params = text_tower_params(txt_sd, tcfg.n_layers)
        model = DistilBert(tcfg)
        ids = rng.integers(0, 30522, size=(B, 16))
        mask = np.ones((B, 16), np.int64)
        got = model.apply({"params": params},
                          jnp.asarray(ids, jnp.int32),
                          jnp.asarray(mask, jnp.int32))
        hf = DistilBertModel(DistilBertConfig(dropout=0.0,
                                              attention_dropout=0.0)).eval()
        missing = hf.load_state_dict(
            {k: torch.tensor(np.ascontiguousarray(v))
             for k, v in txt_sd.items()}, strict=False)
        print("  hf load:", missing)
        with torch.no_grad():
            want = hf(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)).last_hidden_state
        report("text tower hidden states", got, want.numpy())

    if not has_video and not has_text:
        print("checkpoint has neither video_model.* nor text keys; nothing "
              "to probe")
        return False
    return all(results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--num_frames", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()
    ok = probe(args.checkpoint, args.num_frames, args.batch)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
