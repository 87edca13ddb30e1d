"""Task recipes: wire a config into loaders, steps, eval and the Trainer.

One recipe per reference entry point (run/train_{egoclip,epic,charades,
oscc,pnr}.py) dispatched by the config's ``task`` field (or inferred from
the loss/dataset).  Each recipe returns the trained state.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from egovlp_tpu.core.mesh import MODEL_AXIS, MeshSpec, create_mesh, replicated
from egovlp_tpu.evals.charades import evaluate_charades, load_charades_classes
from egovlp_tpu.evals.egomcq import evaluate_egomcq
from egovlp_tpu.evals.epic_mir import embed_dataset, evaluate_epic_mir
from egovlp_tpu.evals.oscc_pnr import evaluate_oscc, evaluate_pnr
from egovlp_tpu.io.checkpoints import CheckpointManager
from egovlp_tpu.io.logging import MetricLogger, setup_logging
from egovlp_tpu.metrics.mir import load_epic_annotations
from egovlp_tpu.train import build
from egovlp_tpu.train.state import create_train_state, make_optimizer, param_count
from egovlp_tpu.train.steps import (
    make_charades_train_step,
    make_egoclip_train_step,
    make_epic_train_step,
    make_oscc_train_step,
    make_pnr_train_step,
)
from egovlp_tpu.train.trainer import Trainer, TrainerConfig


def _visualizer(config):
    """Per-epoch ranking-report writer when the config's visualizer section
    is enabled (reference run/train_epic.py:26-34); None otherwise."""
    from egovlp_tpu.io.visualizer import build_visualizer

    save_dir = (config.get_path("trainer.save_dir", "results")
                if hasattr(config, "get_path") else "results")
    return build_visualizer(config, str(save_dir) + "/web")


def infer_task(config) -> str:
    if "task" in config:
        return config["task"]
    name = str(config.get_path("data_loader.args.dataset_name", ""))
    return {
        "EgoClip_EgoMCQ": "egoclip",
        "MultiInstanceRetrieval": "epic",
        "CharadesEgo": "charades",
        "Ego4D_OSCC": "oscc",
        "Ego4D_PNR": "pnr",
    }.get(name, "egoclip")


def _dl_args(config) -> Dict[str, Any]:
    dl = config["data_loader"]
    if isinstance(dl, list):
        dl = dl[0]
    return dict(dl.get("args", dl))


def _all_dl_args(config):
    """All data_loader entries (the reference zips multiple loaders and
    steps per-loader within each batch index, trainer_egoclip.py:104-107)."""
    dl = config["data_loader"]
    if isinstance(dl, list):
        return [dict(d.get("args", d)) for d in dl]
    return [dict(dl.get("args", dl))]


def _make_train_epoch_fn(loader, step_fn, mesh, max_samples, log_step,
                         logger, seed=0):
    from egovlp_tpu.data.pipeline import device_prefetch

    loaders = loader.loaders if hasattr(loader, "loaders") else [loader]

    def train_epoch(state, epoch, mlog):
        import jax.numpy as jnp

        t0 = time.time()
        streams = [device_prefetch(l.epoch(epoch), mesh, depth=2)
                   for l in loaders]
        # Per-loader DEVICE loss scalars.  Fetching float(loss) every step
        # would block on the device (a full transfer round-trip) and
        # serialize JAX's async dispatch, capping the loop far below the
        # device rate; host syncs happen only every log_step batches and
        # once for the epoch averages (scripts/trainer_loop_bench.py
        # measures this loop against the raw-step roofline).
        losses = [[] for _ in loaders]
        n = 0
        # epoch key hoisted: ONE fold_in program per step — every extra
        # tiny device program in the loop costs fixed dispatch latency
        # (scripts/trainer_loop_bench.py)
        ekey = jax.random.fold_in(jax.random.PRNGKey(seed), epoch)
        nl = len(loaders)
        # one optimizer step per loader per batch index, like the
        # reference's nested loop over its data_loader list
        for i, batch_tuple in enumerate(zip(*streams)):
            if max_samples and (i + 1) * loader.batch_size > max_samples:
                break
            for dl_idx, batch in enumerate(batch_tuple):
                rng = jax.random.fold_in(ekey, i * nl + dl_idx)
                state, loss = step_fn(state, batch, rng)
                losses[dl_idx].append(loss)
                n += 1
            if i % log_step == 0:
                mlog.set_step((epoch - 1) * len(loader) + i, "train")
                for dl_idx in range(len(loaders)):
                    lv = float(losses[dl_idx][-1])  # the only in-loop sync
                    # reference TB tag Loss_training/loss_{dl_idx}
                    # (trainer_egoclip.py:143-148); single-loader runs keep
                    # the plain 'loss' scalar
                    mlog.scalar(f"loss_{dl_idx}" if len(loaders) > 1
                                else "loss", lv)
                    logger.info(
                        "epoch %d step %d dl%d loss %.4f (%.2f s/it)",
                        epoch, i, dl_idx, lv,
                        (time.time() - t0) / max(n, 1))
        # epoch-average per loader (reference log keys loss_{dl_idx},
        # trainer_egoclip.py:165-167); one device fetch per loader
        return state, {
            f"loss_{dl_idx}": float(jnp.mean(jnp.stack(ls))) if ls else 0.0
            for dl_idx, ls in enumerate(losses)
        }

    return train_epoch


def run_task(config, resume: Optional[str] = None):
    logger = setup_logging()
    task = infer_task(config)
    logger.info("task: %s", task)

    n_devices = config.get("n_devices")
    if n_devices:
        devices = jax.devices()
        if len(devices) < n_devices:
            raise ValueError(
                f"config requests n_devices={n_devices} but only "
                f"{len(devices)} devices are visible"
            )
        devices = devices[:n_devices]
    else:
        devices = None
    mesh_cfg = config.get("mesh", {}) or {}
    mesh = create_mesh(MeshSpec(data=int(mesh_cfg.get("data", -1)),
                                model=int(mesh_cfg.get("model", 1)),
                                # multi-slice pods: data parallelism across
                                # slices over DCN (folds slice-major into
                                # the data axis; see core/mesh.py)
                                dcn_data=int(mesh_cfg.get("dcn_data", 1))),
                       devices)
    arch = config["arch"]
    if mesh_cfg.get("sequence_parallel") and mesh.shape.get("model", 1) <= 1:
        # ADVICE r2: a pure-data mesh silently ignored the flag before
        logger.warning(
            "mesh.sequence_parallel is set but the mesh has no model axis "
            "(model=1) — sequence parallelism is OFF; set mesh.model >= 2"
        )
    if mesh.shape.get("model", 1) > 1:
        # the fused Pallas kernels partition under the mesh (Shardy rules,
        # kernels/pallas_attention.py), so tensor parallelism keeps the
        # default attention_impl; only sp wiring is injected here
        arch = dict(arch)
        args = dict(arch.get("args", {}))
        vp = dict(args.get("video_params", {}))
        if mesh_cfg.get("sequence_parallel"):
            # Ulysses-style context parallelism rides the model axis:
            # token grid sharded over it, one all-to-all per time<->space
            # phase change (egovlp_tpu/core/sp.py)
            vp["sequence_parallel"] = MODEL_AXIS
        args["video_params"] = vp
        arch["args"] = args
    model, mcfg = build.build_model(arch)
    params = build.init_params(model, mcfg)
    params = build.load_pretrained(params, mcfg, arch, logger)
    logger.info("model: %.1fM params", param_count(params) / 1e6)

    dl_args = _dl_args(config)
    if dl_args.get("validation_split"):
        # the recipe tasks evaluate on their explicit val/test splits (the
        # reference's main path does too); accepting the key here would
        # silently discard the carved-out fraction
        raise ValueError(
            "validation_split is a Loader-level feature — build the loader "
            "yourself and use Loader(validation_split=...).split_validation()"
            "; recipe tasks use explicit val/test splits")
    tok_len = int(config.get_path("arch.args.text_params.max_length", 30))
    tokenizer = build.build_tokenizer(config, tok_len)
    if tokenizer is None:
        logger.warning("no vocab.txt found; text batches stay raw strings")

    trainer_cfg = config.get("trainer", {})
    max_samples = trainer_cfg.get("max_samples_per_epoch")
    input_res = int(dl_args.get("video_params", {}).get("input_res", 224))

    # config batch_size is PER CHIP (the reference's per-GPU convention,
    # configs/pt/egoclip.json bs 16/GPU); the host loader feeds the local
    # slice of the global batch.
    local_chips = sum(d.process_index == jax.process_index()
                      for d in mesh.devices.flat)
    all_args = _all_dl_args(config)
    train_loaders = []
    for a in all_args:
        a = dict(a)
        a["batch_size"] = int(a.get("batch_size", 16)) * max(local_chips, 1)
        train_loaders.append(build.build_loader(
            a, "train", tokenizer, max_samples_per_epoch=max_samples))
    if len(train_loaders) == 1:
        train_loader = train_loaders[0]
    else:
        from egovlp_tpu.data.pipeline import MultiLoader

        train_loader = MultiLoader(train_loaders)
    per_chip_bs = int(dl_args.get("batch_size", 16))
    dl_args = dict(dl_args)
    dl_args["batch_size"] = per_chip_bs * max(local_chips, 1)
    steps_per_epoch = max(len(train_loader), 1)

    opt_args = config.get("optimizer", {}).get("args", {})
    lr = float(opt_args.get("lr", 3e-5))
    milestones = tuple(trainer_cfg.get("lr_milestones", (60, 80)))
    tx = make_optimizer(lr, milestones, steps_per_epoch,
                        weight_decay=float(opt_args.get("weight_decay", 0.0)),
                        mu_dtype=opt_args.get("mu_dtype"),
                        variant=opt_args.get("variant", "optax"))
    state = create_train_state(model, params, tx)
    if mesh.shape.get("model", 1) > 1:
        from egovlp_tpu.core.tp import shard_state_tp

        state = shard_state_tp(state, mesh)
        logger.info("tensor parallelism: model axis %d (Megatron-style "
                    "column/row shardings; see egovlp_tpu/core/tp.py)",
                    mesh.shape["model"])
    else:
        state = jax.device_put(state, replicated(mesh))

    loss_cfg = config.get("loss", {})
    loss_type = loss_cfg.get("type", "EgoNCE")
    loss_args = loss_cfg.get("args", {})
    # donate the train state to the jitted step: the epoch loop always
    # rebinds it, so XLA can update params/opt-state in place instead of
    # holding two copies (~2.6 GB peak HBM on the flagship model).
    # trainer.donate_state=false opts out (e.g. when driving the step
    # manually and reusing a state object).
    donate = bool(trainer_cfg.get("donate_state", True))

    # ---- task step + validation --------------------------------------
    if task == "egoclip":
        step = make_egoclip_train_step(
            loss_type=loss_type, input_res=input_res,
            temperature=float(loss_args.get("temperature", 0.05)),
            noun=bool(loss_args.get("noun", True)),
            verb=bool(loss_args.get("verb", True)),
            # 'ring' = memory-lean ppermute-ring similarity
            # (objectives/ring.py) for pod-scale global batches
            global_sim=str(loss_args.get("global_sim", "gather")),
            donate=donate,
            # exact contrastive gradient accumulation (GradCache two-pass,
            # train/grad_cache.py): activations for batch/K resident
            n_micro=int(trainer_cfg.get("grad_accum", 1)),
        )
        # the reference forces MCQ val batch 1 — an artifact of its dynamic
        # shapes (run/train_egoclip.py:101-125), not a protocol requirement;
        # our eval folds the 5 options into the batch axis so larger eval
        # batches score identically (tested) while amortising the ~0.55 ms
        # per-call dispatch.  Default 8; trainer.val_batch_size overrides.
        # One val loader PER data_loader entry (the reference derives a val
        # split for every list entry, run/train_egoclip.py:101-125); loader
        # 0's metrics keep their plain names so monitor keys keep working,
        # later loaders get a _{dl_idx} suffix.
        val_loaders = []
        for a in all_args:
            vl = build.build_loader(
                dict(a), "val", tokenizer,
                batch_size=int(trainer_cfg.get("val_batch_size", 8)))
            vl.drop_last = False
            val_loaders.append(vl)

        def valid(state, epoch, mlog):
            out = {}
            for dl_idx, vl in enumerate(val_loaders):
                m = evaluate_egomcq(model, state.params, vl,
                                    input_res=input_res)
                out.update(m if dl_idx == 0 else
                           {f"{k}_{dl_idx}": v for k, v in m.items()})
            mlog.set_step(epoch, "val")
            mlog.scalars(out)
            return out

    elif task == "epic":
        step = make_epic_train_step(
            loss_type=loss_type, input_res=input_res,
            margin=float(loss_args.get("margin",
                                       0.4 if "Adaptive" in loss_type else 0.2)),
            fix_norm=bool(loss_args.get("fix_norm", True)),
            donate=donate,
        )
        val_loader = build.build_loader(dl_args, "test", tokenizer)
        val_loader.drop_last = False
        visualizer = _visualizer(config)

        def valid(state, epoch, mlog):
            t, v, idx, meta = embed_dataset(model, state.params, val_loader,
                                            input_res, return_meta=True)
            video_ids, text_ids, rel = load_epic_annotations(
                dl_args.get("meta_dir") or dl_args["data_dir"])
            m = evaluate_epic_mir(t, v, video_ids, text_ids, rel,
                                  use_dual_softmax=bool(
                                      config.get("dual_softmax", False)))
            if visualizer is not None:
                # per-epoch ranking report (reference trainer_epic.py:262-267)
                import jax.numpy as jnp
                import numpy as np

                from egovlp_tpu.models.dual_encoder import sim_matrix

                sims = np.asarray(sim_matrix(jnp.asarray(t), jnp.asarray(v)))
                visualizer.visualize_ranking(sims, epoch, meta["texts"],
                                             meta["paths"])
            mlog.set_step(epoch, "val")
            mlog.scalars(m)
            return m

    elif task == "charades":
        step = make_charades_train_step(
            input_res=input_res,
            temperature=float(loss_args.get("temperature", 0.05)),
            donate=donate,
        )
        val_loader = build.build_loader(dl_args, "test", tokenizer)
        val_loader.drop_last = False
        classes_file = config.get(
            "charades_classes",
            f"{dl_args.get('meta_dir', dl_args['data_dir'])}/Charades_v1_classes.txt",
        )

        charades_vis = _visualizer(config)

        def valid(state, epoch, mlog):
            m = evaluate_charades(
                model, state.params, val_loader,
                load_charades_classes(classes_file), tokenizer, input_res,
                visualizer=charades_vis, epoch=epoch)
            mlog.set_step(epoch, "val")
            mlog.scalars(m)
            return m

    elif task in ("oscc", "pnr"):
        step = (make_oscc_train_step(input_res, donate=donate)
                if task == "oscc"
                else make_pnr_train_step(input_res, donate=donate))
        val_loader = build.build_loader(dl_args, "val", tokenizer)
        val_loader.drop_last = False
        ev = evaluate_oscc if task == "oscc" else evaluate_pnr

        def valid(state, epoch, mlog):
            m = ev(model, state.params, val_loader, input_res)
            mlog.set_step(epoch, "val")
            mlog.scalars(m)
            return m

    else:
        raise NotImplementedError(task)

    # ---- run dirs / logging / resume ----------------------------------
    dirs = config.make_run_dirs() if hasattr(config, "make_run_dirs") else {}
    mlog = MetricLogger(str(dirs.get("tf", "")) or None,
                        enabled=jax.process_index() == 0)
    ckpt_dir = str(dirs.get("models", "checkpoints"))
    # trainer.async_save=true overlaps Orbax writes with the next epoch
    ckpt = CheckpointManager(
        ckpt_dir, async_save=bool(trainer_cfg.get("async_save", False)))
    start_epoch = 1
    if resume:
        restored = ckpt.restore(resume, template={
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step, "epoch": 0, "monitor_best": 0.0,
        })
        state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
        start_epoch = int(restored["epoch"]) + 1
        logger.info("resumed from %s at epoch %d", resume, start_epoch)

    # ---- ZeRO storage sharding (mesh.zero: 1 = moments, 3 = +params) ---
    # applied AFTER resume so restored host arrays get the sharded layout
    zero_stage = int(mesh_cfg.get("zero", 0) or 0)
    if zero_stage:
        from egovlp_tpu.core.zero import apply_zero

        step, state = apply_zero(step, state, mesh, stage=zero_stage,
                                 logger=logger)

    tcfg = TrainerConfig(
        epochs=int(trainer_cfg.get("epochs", 10)),
        save_period=int(trainer_cfg.get("save_period", 1)),
        monitor=trainer_cfg.get("monitor", "off"),
        early_stop=int(trainer_cfg.get("early_stop", 10)),
        init_val=bool(trainer_cfg.get("init_val", False)),
        save_dir=ckpt_dir,
        start_epoch=start_epoch,
    )
    log_step = int(np.sqrt(train_loader.batch_size)) or 1
    train_epoch_fn = _make_train_epoch_fn(
        train_loader, step, mesh, max_samples, log_step, logger)
    trainer = Trainer(tcfg, train_epoch_fn, valid, ckpt=ckpt,
                      metric_logger=mlog)
    return trainer.train(state)
