"""Published-number parity verifier: the full 90.7 / 57.2 chain.

Given the real published weights (and, when available, the EgoMCQ
annotations + Ego4D video chunks), this runs every link of the parity chain
and emits a single PASS/FAIL report:

  1. converter + activation parity — the checkpoint converts and the Flax
     towers reproduce independent torch oracles on random inputs
     (scripts/parity_probe.py);
  2. EgoMCQ evaluation — the converted model is evaluated with the
     protocol-exact metric (egovlp_tpu/evals/egomcq.py) and compared to the
     published numbers: Inter-video 90.7, Intra-video 57.2
     (/root/reference/README.md:97).

Stage 2 needs the real dataset; without ``--config`` only stage 1 runs
(still a meaningful converter-fidelity check).  Exit code 0 = all run
stages passed.

    # activation parity only
    python scripts/verify_parity.py --checkpoint pretrained/egovlp.pth

    # full chain against the published numbers
    python scripts/verify_parity.py --checkpoint pretrained/egovlp.pth \
        --config configs/eval/egomcq.json \
        --expect-inter 90.7 --expect-intra 57.2 --tol 0.5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity_probe import probe  # noqa: E402 (sibling script)


def main():
    ap = argparse.ArgumentParser(description="EgoVLP published-number "
                                 "parity verifier")
    ap.add_argument("--checkpoint", required=True,
                    help="torch .pth (published egovlp.pth) or orbax dir")
    ap.add_argument("--config", default=None,
                    help="eval config (configs/eval/egomcq.json) — enables "
                    "stage 2 when the dataset paths inside it exist")
    ap.add_argument("--num_frames", type=int, default=4)
    ap.add_argument("--expect-inter", type=float, default=90.7)
    ap.add_argument("--expect-intra", type=float, default=57.2)
    ap.add_argument("--tol", type=float, default=0.5,
                    help="absolute tolerance on accuracy percent")
    args = ap.parse_args()

    stages = {}

    print("== stage 1: converter + activation parity ==")
    stages["activation_parity"] = probe(args.checkpoint, args.num_frames)

    if args.config:
        print("== stage 2: EgoMCQ protocol evaluation ==")
        from egovlp_tpu.cli import eval as eval_cli
        from egovlp_tpu.io.config import load_config
        from egovlp_tpu.io.logging import setup_logging
        from egovlp_tpu.train import build
        from egovlp_tpu.train.recipes import _dl_args
        from egovlp_tpu.evals.egomcq import evaluate_egomcq

        logger = setup_logging()
        config = load_config(args.config)
        arch = config["arch"]
        model, mcfg = build.build_model(arch)
        params = eval_cli.load_params(model, mcfg, arch, args.checkpoint,
                                      logger)
        dl_args = _dl_args(config)
        tokenizer = build.build_tokenizer(config, int(
            config.get_path("arch.args.text_params.max_length", 30)))
        loader = build.build_loader(dl_args, "val", tokenizer, batch_size=1)
        loader.drop_last = False
        input_res = int(dl_args.get("video_params", {}).get("input_res", 224))
        metrics = evaluate_egomcq(model, params, loader, input_res,
                                  progress=True)
        print(json.dumps(metrics, indent=2, default=float))
        inter = float(metrics.get("Inter-video", float("nan")))
        intra = float(metrics.get("Intra-video", float("nan")))
        stages["egomcq_inter"] = abs(inter - args.expect_inter) <= args.tol
        stages["egomcq_intra"] = abs(intra - args.expect_intra) <= args.tol
        print(f"Inter-video {inter:.2f} vs {args.expect_inter} "
              f"(tol {args.tol}): {'OK' if stages['egomcq_inter'] else 'FAIL'}")
        print(f"Intra-video {intra:.2f} vs {args.expect_intra} "
              f"(tol {args.tol}): {'OK' if stages['egomcq_intra'] else 'FAIL'}")
    else:
        print("(stage 2 skipped: no --config; activation parity only)")

    ok = all(stages.values())
    print(f"\nverify-parity: {'PASS' if ok else 'FAIL'} "
          f"({sum(stages.values())}/{len(stages)} stages)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
