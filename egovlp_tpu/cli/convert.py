"""Checkpoint conversion CLI: torch <-> orbax.

    # import: reference egovlp.pth -> orbax tree (ready for cli.eval/train)
    python -m egovlp_tpu.cli.convert import_torch \
        --checkpoint pretrained/egovlp.pth --config configs/eval/egomcq.json \
        --out checkpoints/egovlp_orbax

    # export: orbax tree -> reference-compatible torch pickle
    python -m egovlp_tpu.cli.convert export_torch \
        --checkpoint results/.../model_best --config ... --out egovlp_tpu.pth

    # inspect: summarize any checkpoint (torch pickle OR orbax tree)
    python -m egovlp_tpu.cli.convert inspect -k pretrained/egovlp.pth
"""

from __future__ import annotations

import argparse

from egovlp_tpu.io.checkpoints import CheckpointManager
from egovlp_tpu.io.config import load_config
from egovlp_tpu.io.logging import setup_logging
from egovlp_tpu.models.convert import (
    dual_encoder_params,
    load_torch_weights,
    save_torch_checkpoint,
)
from egovlp_tpu.train import build


def inspect_checkpoint(path: str, print_fn=print) -> dict:
    """Summarize a checkpoint: per-tensor shapes/dtypes, param count,
    trainer metadata.  Accepts a torch pickle (reference format) or an
    orbax tree — the user-facing replacement for the reference's
    ``model/load_checkpoint.py`` debug scratch (a hardcoded
    ``torch.load``; file:1-8).  Returns ``{name: (shape, dtype)}``."""
    import os

    import numpy as np

    meta = {}
    if os.path.isdir(path):
        children = os.listdir(path)
        if any(c.startswith("checkpoint-epoch") or c == "model_best"
               for c in children):
            # run dir: restore(path) resolves to the latest epoch, or
            # model_best when that's all the directory holds
            restored = CheckpointManager(path).restore(path)
        else:  # a checkpoint leaf itself
            restored = CheckpointManager(
                os.path.dirname(os.path.abspath(path))).restore(path)
        flat = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix}{k}." if prefix else f"{k}.", v)
            elif prefix and hasattr(node, "shape"):
                flat[prefix[:-1]] = node

        walk("", restored.get("params", restored))
        for k in ("epoch", "monitor_best"):
            if k in restored:
                meta[k] = restored[k]
        tensors = flat
    else:
        import torch  # host-side tooling only

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            for k in ("epoch", "monitor_best", "config"):
                if k in obj:
                    meta[k] = obj[k] if k != "config" else type(obj[k]).__name__
            obj = obj["state_dict"]
        tensors = {k: v for k, v in obj.items() if hasattr(v, "shape")}

    summary = {}
    total = 0
    for name in sorted(tensors):
        t = tensors[name]
        shape = tuple(t.shape)
        total += int(np.prod(shape)) if shape else 1
        summary[name] = (shape, str(getattr(t, "dtype", "?")))
        print_fn(f"{name:<72s} {str(shape):<20s} {summary[name][1]}")
    print_fn(f"-- {len(summary)} tensors, {total / 1e6:.2f}M params"
             + (f", meta={meta}" if meta else ""))
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description="egovlp_tpu checkpoint converter")
    ap.add_argument("mode", choices=("import_torch", "export_torch",
                                     "inspect"))
    ap.add_argument("--checkpoint", "-k", required=True)
    ap.add_argument("--config", "-c",
                    help="task config defining the architecture "
                         "(required except for inspect)")
    ap.add_argument("--out", "-o", help="output path (not for inspect)")
    ap.add_argument("--load_temporal_fix", default="zeros",
                    choices=("zeros", "interp", "bilinear", "nearest"))
    args = ap.parse_args(argv)

    if args.mode == "inspect":
        inspect_checkpoint(args.checkpoint)
        return
    if not args.config or not args.out:
        ap.error(f"{args.mode} requires --config and --out")

    logger = setup_logging()
    config = load_config(args.config)
    model, mcfg = build.build_model(config["arch"])
    template = build.init_params(model, mcfg)

    if args.mode == "import_torch":
        sd = load_torch_weights(args.checkpoint)
        params = dual_encoder_params(sd, mcfg, template,
                                     args.load_temporal_fix)
        cm = CheckpointManager(args.out)
        cm.save_epoch(0, {"params": params, "epoch": 0, "monitor_best": 0.0})
        logger.info("wrote orbax checkpoint to %s", args.out)
    else:
        restored = CheckpointManager(args.checkpoint).restore(args.checkpoint)
        save_torch_checkpoint(restored["params"], mcfg, args.out,
                              epoch=int(restored.get("epoch", 0)))
        logger.info("wrote torch checkpoint to %s", args.out)


if __name__ == "__main__":
    main()
