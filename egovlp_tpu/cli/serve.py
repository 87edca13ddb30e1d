"""Embedding service CLI.

    python -m egovlp_tpu.cli.serve --config configs/eval/egomcq.json \
        [--checkpoint ...] [--port 8000]

AOT mode (jax.export artifacts, egovlp_tpu/io/export.py):

    # produce a frozen StableHLO artifact (optionally multi-platform)
    ... --config c.json --checkpoint k --export-aot embedder.zip \
        [--platforms cpu,tpu]
    # serve from the artifact (no retracing; model code only for params)
    ... --config c.json --checkpoint k --aot embedder.zip
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
    ap.add_argument("--export-aot", default=None, metavar="PATH",
                    help="export a jax.export StableHLO artifact and exit")
    ap.add_argument("--aot", default=None, metavar="PATH",
                    help="serve from a previously exported artifact")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms for "
                         "--export-aot (e.g. cpu,tpu)")
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
    num_frames = int(vp.get("num_frames", 4))
    input_res = int(vp.get("input_res", 224))

    if args.export_aot:
        from egovlp_tpu.io.export import export_embedder

        platforms = (tuple(p.strip() for p in args.platforms.split(","))
                     if args.platforms else None)
        manifest = export_embedder(
            model, params, args.export_aot, num_frames=num_frames,
            input_res=input_res, max_length=tokenizer.max_length,
            platforms=platforms)
        logger.info("exported %s: buckets=%s platforms=%s",
                    args.export_aot, manifest["buckets"],
                    manifest["platforms"] or "default")
        return

    if args.aot:
        from egovlp_tpu.io.export import ExportedEmbedder

        emb = ExportedEmbedder(args.aot, params, tokenizer)
        logger.info("serving AOT artifact %s (buckets=%s)", args.aot,
                    emb.buckets)
    else:
        emb = Embedder(model, params, tokenizer, num_frames=num_frames,
                       input_res=input_res)
    logger.info("serving on %s:%d", args.host, args.port)
    serve(emb, args.host, args.port)


if __name__ == "__main__":
    main()
