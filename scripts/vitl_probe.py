"""ViT-L derivative real-chip probe (single chip), with an in-session
ViT-B baseline.

The ViT-L tp+sp showcase config (configs/pt/egoclip_vitl_tp.json) is
dryrun-verified on the virtual mesh; this probe measures what ONE chip
delivers on the ViT-L tower (embed 1024 / depth 24 / heads 16) at the 4f
pretrain shape with remat='attn_out', giving the per-chip baseline the
multi-chip configs scale from.  The ViT-B flagship step runs in the SAME
process so the L/B ratio is session-noise-free (this shared chip drifts
up to 2x across sessions).  Prints one JSON line.

Run via nohup (never kill a TPU job): nohup python scripts/vitl_probe.py &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(tag, video_kw, B, iters=6):
    import jax
    import jax.numpy as jnp

    from egovlp_tpu.core.mesh import MeshSpec, create_mesh, replicated, shard_batch
    from egovlp_tpu.models import (
        DualEncoder,
        DualEncoderConfig,
        VideoTowerConfig,
    )
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    T, R, L, P = 4, 224, 30, 256
    cfg = DualEncoderConfig(video=VideoTowerConfig(num_frames=T, **video_kw))
    model = DualEncoder(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mesh = create_mesh(MeshSpec())

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, R, R * 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32))["params"]
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    state = jax.device_put(
        create_train_state(model, params, make_optimizer(3e-5, (60, 80), 1000)),
        replicated(mesh))
    batch = shard_batch({
        "frames": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, 30522, (B, L)).astype(np.int32),
        "text_mask": np.ones((B, L), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
    }, mesh)
    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=R, donate=True)
    key = jax.random.PRNGKey(0)
    state, loss = step(state, batch, key)
    float(loss)
    # several timed windows, MEDIAN reported: the first window after a
    # fresh compile on this shared chip can run ~8x slow (grant warmup;
    # the same transient hit opt_step_ab round 0)
    windows = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = step(state, batch, jax.random.fold_in(key, i))
        float(loss)
        windows.append(time.perf_counter() - t0)
    dt = float(np.median(windows))
    del state, batch, params
    import jax as _jax
    return {
        f"{tag}_clips_per_sec_per_chip": round(
            B * iters / dt / _jax.device_count(), 2),
        f"{tag}_ms_per_step": round(dt / iters * 1e3, 1),
        f"{tag}_ms_windows": [round(x / iters * 1e3, 1) for x in windows],
        f"{tag}_params_millions": round(float(n_params) / 1e6, 1),
        f"{tag}_batch": B,
    }


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    out = {"metric": "vitl_vs_vitb_same_session"}
    # ViT-B flagship (the bench.py config) first: its compile is cached
    out.update(measure("vitb", dict(), B=16))
    print(json.dumps({k: v for k, v in out.items()}), flush=True)
    out.update(measure(
        "vitl", dict(embed_dim=1024, depth=24, num_heads=16,
                     remat="attn_out"), B=8))
    vb = out["vitb_clips_per_sec_per_chip"]
    vl = out["vitl_clips_per_sec_per_chip"]
    out["l_over_b_clip_rate"] = round(vl / vb, 3) if vb else None
    out["config"] = "4f 224^2 bf16; L: remat=attn_out bs8, B: bs16"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
