"""Full-step optimizer A/B on the real chip (follow-up to opt_tail_ab).

opt_tail_ab isolates the AdamW update (optax 10.3 / fused 9.2 /
fused+bf16mu 8.0 ms per update on the 180.9M tree).  In the production
step the update fuses INTO the backward epilogue, so this script A/Bs
the whole 4f EgoClip train step with the optimizer variant as the only
difference, alternating in-session:

    nohup python scripts/opt_step_ab.py > /tmp/opt_step_ab.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 5
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    from egovlp_tpu.core.mesh import (MeshSpec, create_mesh, replicated,
                                      shard_batch)
    from egovlp_tpu.models import DualEncoder, DualEncoderConfig
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    rng = np.random.default_rng(0)
    B, T, R, L, P = 16, 4, 224, 30, 256
    cfg = DualEncoderConfig()
    model = DualEncoder(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, R, R * 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32))["params"]
    mesh = create_mesh(MeshSpec())
    batch = shard_batch({
        "frames": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "frames_neg": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, cfg.text.vocab_size, (B, L)).astype(
            np.int32),
        "text_mask": np.ones((B, L), np.int32),
        "text_neg_ids": rng.integers(0, cfg.text.vocab_size, (B, L)).astype(
            np.int32),
        "text_neg_mask": np.ones((B, L), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
        "noun_vec_neg": np.eye(B, 582, dtype=np.float32),
        "verb_vec_neg": np.eye(B, 118, dtype=np.float32),
    }, mesh)

    variants = {
        "optax": dict(variant="optax"),
        "fused": dict(variant="fused"),
        "fused_bf16mu": dict(variant="fused", mu_dtype="bfloat16"),
    }
    # one step factory: the jitted fn re-specializes on each state's tx
    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=R,
                                   donate=True)
    key = jax.random.PRNGKey(0)
    results = {name: [] for name in variants}

    copy_tree = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

    def fresh_state(name):
        tx = make_optimizer(3e-5, (60, 80), 1000, **variants[name])
        # the donated step consumes the state's params — give each state
        # its own device-side copy so the shared init tree survives
        return jax.device_put(
            create_train_state(model, copy_tree(params), tx),
            replicated(mesh))

    for rnd in range(ROUNDS):
        for name in variants:
            st = fresh_state(name)
            st, loss = step(st, batch, key)       # warm/compile
            float(loss)
            t0 = time.perf_counter()
            for i in range(STEPS):
                st, loss = step(st, batch, jax.random.fold_in(key, i))
            float(loss)
            ms = (time.perf_counter() - t0) / STEPS * 1e3
            results[name].append(round(ms, 1))
            print(json.dumps({"round": rnd, "variant": name,
                              "ms_per_step": round(ms, 1)}), flush=True)
            del st
    print(json.dumps({
        "metric": "opt_step_ab_ms_per_step",
        **{name: round(float(np.median(v)), 1)
           for name, v in results.items()},
        "rounds": results,
    }), flush=True)


if __name__ == "__main__":
    main()
