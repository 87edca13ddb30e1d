"""NLQ / MQ dense feature extraction CLI (run/test_nlq.py, test_mq.py).

    python -m egovlp_tpu.cli.extract --config configs/eval/nlq.json \
        --checkpoint ... --subsample video --out features/nlq
"""

from __future__ import annotations

import argparse

from egovlp_tpu.evals.features import extract_text_features, extract_video_features
from egovlp_tpu.io.config import load_config
from egovlp_tpu.io.logging import setup_logging
from egovlp_tpu.train import build
from egovlp_tpu.train.recipes import _dl_args
from egovlp_tpu.cli.eval import load_params


def main(argv=None):
    ap = argparse.ArgumentParser(description="egovlp_tpu feature extractor")
    ap.add_argument("--config", "-c", required=True)
    ap.add_argument("--checkpoint", "-k", default=None)
    ap.add_argument("--subsample", choices=("video", "text"), default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--token_level", action="store_true",
                    help="text mode: save token-level features")
    ap.add_argument("--save_format", choices=("npy", "pt"), default="npy")
    args = ap.parse_args(argv)

    logger = setup_logging()
    config = load_config(args.config)
    arch = config["arch"]
    model, mcfg = build.build_model(arch)
    params = load_params(model, mcfg, arch, args.checkpoint, logger)

    dl_args = _dl_args(config)
    if args.subsample:
        dl_args["subsample"] = args.subsample
    dataset = build.build_dataset(dl_args, args.split)

    if dl_args.get("subsample") == "text":
        tokenizer = build.build_tokenizer(config)
        extract_text_features(model, params, dataset, tokenizer, args.out,
                              token_level=args.token_level,
                              save_format=args.save_format, progress=True)
    else:
        extract_video_features(
            model, params, dataset, args.out,
            num_frames=int(dl_args.get("video_params", {}).get("num_frames", 4)),
            input_res=int(dl_args.get("video_params", {}).get("input_res", 224)),
            save_format=args.save_format, progress=True)


if __name__ == "__main__":
    main()
