"""Offline evaluation CLI (the reference's run/test_*.py equivalents).

    python -m egovlp_tpu.cli.eval --config configs/eval/egomcq.json \
        --checkpoint results/models/.../model_best [--dual_softmax]

Dispatches on the config's task: egomcq, epic (nDCG/mAP with optional
dual-softmax, run/test_epic.py), charades (157-class mAP,
run/test_charades.py), oscc, pnr.
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from egovlp_tpu.evals.charades import evaluate_charades, load_charades_classes
from egovlp_tpu.evals.egomcq import evaluate_egomcq
from egovlp_tpu.evals.epic_mir import embed_dataset, evaluate_epic_mir
from egovlp_tpu.evals.oscc_pnr import evaluate_oscc, evaluate_pnr
from egovlp_tpu.io.checkpoints import CheckpointManager
from egovlp_tpu.io.config import load_config
from egovlp_tpu.io.logging import setup_logging
from egovlp_tpu.io.visualizer import build_visualizer
from egovlp_tpu.metrics.mir import load_epic_annotations
from egovlp_tpu.train import build
from egovlp_tpu.train.recipes import _dl_args, infer_task


def load_params(model, mcfg, arch, checkpoint, logger):
    params = build.init_params(model, mcfg)
    if checkpoint and checkpoint.endswith((".pth", ".bin", ".pt")):
        arch = dict(arch)
        arch.setdefault("args", {})["load_checkpoint"] = checkpoint
        return build.load_pretrained(params, mcfg, arch, logger)
    params = build.load_pretrained(params, mcfg, arch, logger)
    if checkpoint:
        restored = CheckpointManager(checkpoint).restore(checkpoint)
        params = restored["params"]
        logger.info("restored orbax checkpoint %s", checkpoint)
    return params


def main(argv=None):
    ap = argparse.ArgumentParser(description="egovlp_tpu evaluator")
    ap.add_argument("--config", "-c", required=True)
    ap.add_argument("--checkpoint", "-k", default=None,
                    help="orbax dir or torch .pth")
    ap.add_argument("--dual_softmax", action="store_true")
    ap.add_argument("--split", default=None)
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize(); each process "
                         "evaluates its loader shard and the evals gather "
                         "before metrics (core/dist_eval.py), so every host "
                         "reports full-dataset numbers")
    args = ap.parse_args(argv)

    if args.multihost:
        import jax

        jax.distributed.initialize()

    logger = setup_logging()
    config = load_config(args.config)
    task = infer_task(config)
    arch = config["arch"]
    model, mcfg = build.build_model(arch)
    params = load_params(model, mcfg, arch, args.checkpoint, logger)

    dl_args = _dl_args(config)
    tokenizer = build.build_tokenizer(
        config, int(config.get_path("arch.args.text_params.max_length", 30)))
    input_res = int(dl_args.get("video_params", {}).get("input_res", 224))
    split = args.split or ("val" if task in ("egomcq", "egoclip", "oscc",
                                             "pnr") else "test")

    if task in ("egoclip", "egomcq"):
        # batched 5-option fold scores identically to the reference's
        # batch 1 (tested) at ~8x fewer dispatches
        bs = int(config.get("trainer", {}).get("val_batch_size", 8))
        loader = build.build_loader(dl_args, split, tokenizer, batch_size=bs)
        loader.drop_last = False
        metrics = evaluate_egomcq(model, params, loader, input_res,
                                  progress=True)
    elif task == "epic":
        loader = build.build_loader(dl_args, split, tokenizer)
        loader.drop_last = False
        save_dir = (config.get_path("trainer.save_dir", "results")
                    if hasattr(config, "get_path")
                    else config.get("trainer", {}).get("save_dir", "results"))
        visualizer = build_visualizer(config, save_dir + "/web")
        t, v, _idx, meta = embed_dataset(model, params, loader, input_res,
                                         progress=True, return_meta=True)
        video_ids, text_ids, rel = load_epic_annotations(
            dl_args.get("meta_dir") or dl_args["data_dir"])
        metrics = evaluate_epic_mir(t, v, video_ids, text_ids, rel,
                                    use_dual_softmax=args.dual_softmax)
        if visualizer is not None:
            from egovlp_tpu.models.dual_encoder import sim_matrix as _sm

            sims = np.asarray(_sm(jnp.asarray(t), jnp.asarray(v)))
            page = visualizer.visualize_ranking(sims, 0, meta["texts"],
                                                meta["paths"])
            logger.info("wrote retrieval report %s", page)
    elif task == "charades":
        loader = build.build_loader(dl_args, split, tokenizer)
        loader.drop_last = False
        classes = load_charades_classes(config.get(
            "charades_classes",
            f"{dl_args.get('meta_dir', dl_args['data_dir'])}/Charades_v1_classes.txt"))
        save_dir = (config.get_path("trainer.save_dir", "results")
                    if hasattr(config, "get_path")
                    else config.get("trainer", {}).get("save_dir", "results"))
        metrics = evaluate_charades(
            model, params, loader, classes, tokenizer, input_res,
            progress=True,
            visualizer=build_visualizer(config, save_dir + "/web"))
    elif task in ("oscc", "pnr"):
        loader = build.build_loader(dl_args, split, tokenizer)
        loader.drop_last = False
        ev = evaluate_oscc if task == "oscc" else evaluate_pnr
        metrics = ev(model, params, loader, input_res, progress=True)
    else:
        raise NotImplementedError(task)

    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
