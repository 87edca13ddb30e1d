"""ViT-L derivative real-chip probe (single chip).

The ViT-L tp+sp showcase config (configs/pt/egoclip_vitl_tp.json) is
dryrun-verified on the virtual mesh; this probe measures what ONE chip
delivers on the ViT-L tower (embed 1024 / depth 24 / heads 16) at the 4f
pretrain shape with remat='attn_out', giving the per-chip baseline the
multi-chip configs scale from.  Prints one JSON line.

Run via nohup (never kill a TPU job): nohup python scripts/vitl_probe.py &
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
    from egovlp_tpu.models import (
        DualEncoder,
        DualEncoderConfig,
        VideoTowerConfig,
    )
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    B, T, R, L, P = 8, 4, 224, 30, 256
    cfg = DualEncoderConfig(video=VideoTowerConfig(
        embed_dim=1024, depth=24, num_heads=16, num_frames=T,
        remat="attn_out"))
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
    t0 = time.perf_counter()
    iters = 6
    for i in range(iters):
        state, loss = step(state, batch, jax.random.fold_in(key, i))
    float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "vitl_egoclip_clips_per_sec_per_chip",
        "value": round(B * iters / dt / jax.device_count(), 2),
        "ms_per_step": round(dt / iters * 1e3, 1),
        "params_millions": round(float(n_params) / 1e6, 1),
        "config": "ViT-L/16 4f 224^2 bs8 bf16 remat=attn_out",
    }))


if __name__ == "__main__":
    main()
