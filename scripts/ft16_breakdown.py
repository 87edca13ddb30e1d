"""Component-level timing at the 16f EPIC fine-tune shape (bs 16).

Attributes the ft16 roofline gap (step MFU 0.48 vs 0.63 at 4f): times
each tower component scan-amortized inside ONE jit (12 iterations per
sample, so the ~0.55 ms tunnel dispatch amortizes away), then compares
the x12-block sum against the measured full fwd+bwd.  Components:

  patch+pos embed  (B*T=256 folded-image matmuls)
  time attention   (XLA and Pallas variants, fwd and fwd+bwd)
  space attention  (Pallas, fwd and fwd+bwd)
  qkv+proj Dense   (the part remat='attn_out' recomputes)
  MLP              (the MXU workhorse)
  full tower       fwd and fwd+bwd (remat='attn_out', impl='auto')

Run via nohup (never kill a TPU job):
  nohup python scripts/ft16_breakdown.py > /tmp/ft16_breakdown.log &
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
    from flax import linen as nn

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    from egovlp_tpu.kernels.divided_attention import divided_attention_bsd
    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    B, f, n, D, H, R = 16, 16, 196, 768, 12, 224
    S = 1 + f * n
    rng = np.random.default_rng(0)
    results = {}

    def scan_timed(name, body, args, iters=12, reps=3):
        """Median ms/call of ``body`` over ``iters`` lax.scan steps in one
        jit (carry-chained so XLA cannot elide iterations)."""

        @jax.jit
        def run(args):
            def step(carry, _):
                out = body(*args)
                leaves = [l.astype(jnp.float32).sum()
                          for l in jax.tree_util.tree_leaves(out)]
                return carry + sum(leaves) * 1e-9, None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
            return acc

        float(run(args))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(args))
            times.append((time.perf_counter() - t0) / iters * 1e3)
        ms = float(np.median(times))
        results[name] = round(ms, 2)
        print(json.dumps({name: round(ms, 2)}), flush=True)
        return ms

    qkv = jnp.asarray(rng.normal(size=(3, B, S, D)), jnp.bfloat16)
    q, k, v = qkv[0], qkv[1], qkv[2]

    for axis, impls in (("time", ("xla", "pallas")), ("space", ("pallas",))):
        for impl in impls:
            def fwd(q, k, v, axis=axis, impl=impl):
                return divided_attention_bsd(q, k, v, heads=H, frames=f,
                                             patches=n, axis=axis, impl=impl)

            def fwdbwd(q, k, v, fwd=fwd):
                return jax.grad(
                    lambda q, k, v: jnp.sum(fwd(q, k, v).astype(jnp.float32)),
                    argnums=(0, 1, 2))(q, k, v)

            scan_timed(f"{axis}_attn_{impl}_fwd_ms", fwd, (q, k, v))
            scan_timed(f"{axis}_attn_{impl}_fwdbwd_ms", fwdbwd, (q, k, v),
                       iters=6)

    # the Dense traffic around attention: qkv (D -> 3D) + proj (D -> D)
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16)
    wp = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)
    scan_timed("qkv_proj_dense_fwd_ms",
               lambda x, wq, wp: (x @ wq)[..., :D] @ wp, (x, wq, wp))

    # MLP: D -> 4D -> D with gelu
    w1 = jnp.asarray(rng.normal(size=(D, 4 * D)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(4 * D, D)) * 0.02, jnp.bfloat16)

    def mlp(x, w1, w2):
        return nn.gelu(x @ w1) @ w2

    scan_timed("mlp_fwd_ms", mlp, (x, w1, w2))
    scan_timed("mlp_fwdbwd_ms",
               lambda x, w1, w2: jax.grad(
                   lambda a, b, c: jnp.sum(mlp(a, b, c).astype(jnp.float32)),
                   argnums=(0, 1, 2))(x, w1, w2), (x, w1, w2), iters=6)

    # full tower at the ft16 bench configuration
    video = jnp.asarray(rng.normal(size=(B, f, R, R * 3)), jnp.bfloat16)
    model = SpaceTimeTransformer(
        VideoTowerConfig(num_frames=f, remat="attn_out"), dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video[:1])["params"]

    def embed(p, v):
        return model.apply({"params": p}, v, method="embed")

    scan_timed("patch_pos_embed_fwd_ms", embed, (params, video), iters=4)

    def tower_fwd(p, v):
        return model.apply({"params": p}, v)

    def tower_fwdbwd(p, v):
        return jax.grad(lambda p: jnp.sum(
            tower_fwd(p, v).astype(jnp.float32)))(p)

    scan_timed("tower_fwd_ms", tower_fwd, (params, video), iters=4)
    scan_timed("tower_fwdbwd_ms", tower_fwdbwd, (params, video), iters=3)

    # attribution: x12 blocks + embed vs the measured whole
    blocks_fwd = 12 * (results["time_attn_xla_fwd_ms"]
                       + results["space_attn_pallas_fwd_ms"]
                       + results["qkv_proj_dense_fwd_ms"]
                       + results["mlp_fwd_ms"])
    print(json.dumps({
        "metric": "ft16_breakdown",
        "sum_blocks_fwd_plus_embed_ms":
            round(blocks_fwd + results["patch_pos_embed_fwd_ms"], 1),
        "measured_tower_fwd_ms": results["tower_fwd_ms"],
        "measured_tower_fwdbwd_ms": results["tower_fwdbwd_ms"],
        "components": results,
    }))


if __name__ == "__main__":
    main()
