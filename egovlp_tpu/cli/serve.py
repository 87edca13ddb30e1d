"""Embedding service CLI.

    python -m egovlp_tpu.cli.serve --config configs/eval/egomcq.json \
        [--checkpoint ...] [--port 8000]
"""

from __future__ import annotations

import argparse

from egovlp_tpu.cli.eval import load_params
from egovlp_tpu.io.config import load_config
from egovlp_tpu.io.logging import setup_logging
from egovlp_tpu.serving import Embedder, serve
from egovlp_tpu.train import build
from egovlp_tpu.train.recipes import _dl_args


def main(argv=None):
    ap = argparse.ArgumentParser(description="egovlp_tpu embedding service")
    ap.add_argument("--config", "-c", required=True)
    ap.add_argument("--checkpoint", "-k", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args(argv)

    logger = setup_logging()
    config = load_config(args.config)
    model, mcfg = build.build_model(config["arch"])
    params = load_params(model, mcfg, config["arch"], args.checkpoint, logger)
    tokenizer = build.build_tokenizer(config)
    if tokenizer is None:
        raise SystemExit("serving requires a vocab.txt "
                         "(arch.args.text_params.vocab)")
    dl_args = _dl_args(config)
    vp = dl_args.get("video_params", {})
    emb = Embedder(model, params, tokenizer,
                   num_frames=int(vp.get("num_frames", 4)),
                   input_res=int(vp.get("input_res", 224)))
    logger.info("serving on %s:%d", args.host, args.port)
    serve(emb, args.host, args.port)


if __name__ == "__main__":
    main()
