"""4-frame flagship batch-size sweep (real chip, device-resident batches).

The benched flagship runs the production per-chip batch of 16 (+16 scene
negatives), mirroring the reference's 16/GPU (512 global / 32 A100s,
configs/pt/egoclip.json).  This probe asks whether the v5e step leaves
MXU utilization on the table at that size: it times the SAME production
EgoClip train step (donated state, EgoNCE, 4f) at several per-chip batch
sizes, interleaved round-robin in one process so the chip's throttle
drift cancels, and reports clips/s (= B * iters / t).

    nohup python scripts/batch_sweep4f.py 16,24,32 3 > sweep.log &

argv[1] = comma-separated batch sizes (default 16,24,32),
argv[2] = rounds (default 3).
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

    from egovlp_tpu.models import DualEncoder, DualEncoderConfig
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    sizes = ([int(x) for x in sys.argv[1].split(",")]
             if len(sys.argv) > 1 else [16, 24, 32])
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = DualEncoderConfig()
    model = DualEncoder(cfg, dtype=jnp.bfloat16)
    T, R, L = cfg.video.num_frames, cfg.video.img_size, 30
    rng = np.random.default_rng(0)

    video = jnp.zeros((1, T, R, R, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), video,
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )["params"]
    tx = make_optimizer(3e-5, (60, 80), steps_per_epoch=1000)
    state = create_train_state(model, params, tx)
    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=R,
                                   donate=True)

    # device-resident numeric batches (H2D through the tunnel is 0.01-0.04
    # GB/s and would swamp the step; production prefetches)
    def mk_batch(B):
        f32, i32 = jnp.float32, jnp.int32
        return {
            "frames": jnp.asarray(
                rng.random((B, T, R, R * 3), np.float32), f32),
            "frames_neg": jnp.asarray(
                rng.random((B, T, R, R * 3), np.float32), f32),
            "text_ids": jnp.asarray(
                rng.integers(0, cfg.text.vocab_size, (B, L)), i32),
            "text_mask": jnp.ones((B, L), i32),
            "text_neg_ids": jnp.asarray(
                rng.integers(0, cfg.text.vocab_size, (B, L)), i32),
            "text_neg_mask": jnp.ones((B, L), i32),
            "noun_vec": jnp.eye(B, 582, dtype=f32),
            "verb_vec": jnp.eye(B, 118, dtype=f32),
            "noun_vec_neg": jnp.eye(B, 582, dtype=f32),
            "verb_vec_neg": jnp.eye(B, 118, dtype=f32),
        }

    batches = {B: mk_batch(B) for B in sizes}
    key = jax.random.PRNGKey(0)

    # compile every size once (donated lineage threads through)
    for B in sizes:
        state, loss = step(state, batches[B], key)
    float(loss)

    acc = {B: [] for B in sizes}
    iters = 10
    for r in range(rounds):
        for B in sizes:
            state, loss = step(state, batches[B], jax.random.fold_in(key, r))
            float(loss)                       # sync before the timed run
            t0 = time.perf_counter()
            for i in range(iters):
                state, loss = step(state, batches[B],
                                   jax.random.fold_in(key, 1000 + r * 100 + i))
            float(loss)
            cps = B * iters / (time.perf_counter() - t0)
            acc[B].append(cps)
            print(json.dumps({"round": r, "B": B,
                              "clips_per_sec": round(cps, 2)}), flush=True)

    summary = {"metric": "batch_sweep_4f", "rounds": rounds, "iters": iters}
    for B in sizes:
        summary[f"B{B}_clips_per_sec"] = round(float(np.median(acc[B])), 2)
        summary[f"B{B}_ms_per_step"] = round(
            1e3 * B / float(np.median(acc[B])), 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
