"""Checkpoint conversion CLI: torch <-> orbax.

    # import: reference egovlp.pth -> orbax tree (ready for cli.eval/train)
    python -m egovlp_tpu.cli.convert import_torch \
        --checkpoint pretrained/egovlp.pth --config configs/eval/egomcq.json \
        --out checkpoints/egovlp_orbax

    # export: orbax tree -> reference-compatible torch pickle
    python -m egovlp_tpu.cli.convert export_torch \
        --checkpoint results/.../model_best --config ... --out egovlp_tpu.pth
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


def main(argv=None):
    ap = argparse.ArgumentParser(description="egovlp_tpu checkpoint converter")
    ap.add_argument("mode", choices=("import_torch", "export_torch"))
    ap.add_argument("--checkpoint", "-k", required=True)
    ap.add_argument("--config", "-c", required=True,
                    help="task config defining the architecture")
    ap.add_argument("--out", "-o", required=True)
    ap.add_argument("--load_temporal_fix", default="zeros",
                    choices=("zeros", "interp", "bilinear", "nearest"))
    args = ap.parse_args(argv)

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
