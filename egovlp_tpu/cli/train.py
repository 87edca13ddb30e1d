"""Training CLI.

Usage (mirrors the reference's run/train_*.py entry points, minus the DDP
launcher — multi-host initialization is JAX-native):

    python -m egovlp_tpu.cli.train --config configs/pt/egoclip.json \
        [--lr 3e-5] [--bs 16] [--resume PATH] [-o trainer.epochs=2 ...]
"""

from __future__ import annotations

import argparse

from egovlp_tpu.io.config import load_config
from egovlp_tpu.train.recipes import run_task


def main(argv=None):
    ap = argparse.ArgumentParser(description="egovlp_tpu trainer")
    ap.add_argument("--config", "-c", required=True)
    ap.add_argument("--resume", "-r", default=None)
    ap.add_argument("--lr", type=float, default=None,
                    help="override optimizer.args.lr")
    ap.add_argument("--bs", type=int, default=None,
                    help="override data_loader.args.batch_size")
    ap.add_argument("--override", "-o", action="append", default=[],
                    metavar="dotted.path=value",
                    help="arbitrary config override (JSON-parsed value)")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() before running")
    args = ap.parse_args(argv)

    if args.multihost:
        import jax

        jax.distributed.initialize()

    config = load_config(args.config)
    if args.lr is not None:
        config.override("optimizer.args.lr", args.lr)
    if args.bs is not None:
        config.override("data_loader.args.batch_size", args.bs)
    for ov in args.override:
        import json as _json

        k, _, v = ov.partition("=")
        try:
            v = _json.loads(v)
        except ValueError:
            pass
        config.override(k, v)

    run_task(config, resume=args.resume)


if __name__ == "__main__":
    main()
