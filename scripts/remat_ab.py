"""16-frame fine-tune remat A/B on the real chip (VERDICT r2 item 4).

Times one EPIC MaxMargin train step (16f, 224^2, bs 16, bf16 — the
reference's headline fine-tune shape, configs/ft/epic.json) for each remat
variant: none / block / mlp / attn.  Prints one JSON line with
clips/s + ms/step per variant (or the OOM error), plus the step FLOPs so a
16f MFU line can be derived.

Run via nohup (never kill a TPU job):  nohup python scripts/remat_ab.py &
Optional argv: [variants_csv] [mu_dtype] — e.g. ``none,mlp bfloat16``
re-probes the policies that used to OOM once FusedLayerNorm (+fused-LN
VJP) and bf16 first moments have freed HBM.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    from egovlp_tpu.core.mesh import MeshSpec, create_mesh, replicated, shard_batch
    from egovlp_tpu.models import DualEncoder, DualEncoderConfig, VideoTowerConfig
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_epic_train_step, numeric_batch

    B, T, R, L, P = 16, 16, 224, 30, 256
    rng = np.random.default_rng(0)
    mesh = create_mesh(MeshSpec())
    host_batch = {
        "frames": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, 30522, (B, L)).astype(np.int32),
        "text_mask": np.ones((B, L), np.int32),
    }
    batch = shard_batch(host_batch, mesh)
    key = jax.random.PRNGKey(0)
    out = {}

    variants = (sys.argv[1].split(",") if len(sys.argv) > 1
                else ["attn_out", "attn", "block"])
    mu_dtype = sys.argv[2] if len(sys.argv) > 2 else None
    for rm in variants:
        try:
            cfg = DualEncoderConfig(video=VideoTowerConfig(
                num_frames=T, remat=(False if rm == "none" else rm)))
            model = DualEncoder(cfg, dtype=jnp.bfloat16)
            params = jax.jit(model.init)(
                key, jnp.zeros((1, T, R, R * 3), jnp.float32),
                jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
            )["params"]
            state = jax.device_put(
                create_train_state(model, params,
                                   make_optimizer(3e-5, (60, 80), 1000,
                                                  mu_dtype=mu_dtype)),
                replicated(mesh))
            step = make_epic_train_step(loss_type="MaxMarginRankingLoss",
                                        input_res=R, donate=True)
            t_c0 = time.perf_counter()
            state, loss = step(state, batch, key)
            float(loss)
            compile_s = time.perf_counter() - t_c0
            state, loss = step(state, batch, jax.random.fold_in(key, 1))
            float(loss)
            iters = 6
            t0 = time.perf_counter()
            for i in range(iters):
                state, loss = step(state, batch, jax.random.fold_in(key, 2 + i))
            float(loss)
            dt = time.perf_counter() - t0
            entry = {
                "clips_per_sec": round(B * iters / dt / jax.device_count(), 2),
                "ms_per_step": round(dt / iters * 1e3, 1),
                "compile_s": round(compile_s, 1),
            }
            try:
                jitted = getattr(step, "jitted", step)
                cost = jitted.lower(state, numeric_batch(batch), key
                                    ).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                entry["step_gflops"] = round(float(cost.get("flops", 0)) / 1e9)
            except Exception:
                pass
            out[rm] = entry
            del state, params
        except Exception as e:
            out[rm] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({rm: out[rm]}), flush=True)

    print(json.dumps({"metric": "ft16_remat_ab", "variants": out}))


if __name__ == "__main__":
    main()
