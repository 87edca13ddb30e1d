"""Why is the 16f tower backward 10.8x its forward (922 vs 85.6 ms)?

A fwd+bwd with remat='attn_out' should cost ~3.2x fwd (bwd ~2x fwd
FLOPs + the qkv recompute); scripts/ft16_breakdown.py measured 10.8x.
This script A/Bs the candidate causes on the real chip, tower-level,
scan-amortized:

  bs16 / attn_out   - the baseline (reproduces the 922 ms)
  bs8  / attn_out   - halves HBM pressure: linear scaling -> compute-
                      bound; strongly sublinear -> memory-schedule-bound
  bs8  / none       - no remat at low pressure: the 'honest' bwd/fwd
                      ratio when XLA isn't fighting HBM
  bs16 / attn       - coarser remat (recomputes the whole attention):
                      more FLOPs but ~1.85 GB less resident
  bs16 / attn_out / input-grads-only - drops the weight-grad matmuls;
                      isolates whether wgrads are the pathology

Run via nohup (never kill a TPU job):
  nohup python scripts/ft16_bwd_ab.py > /tmp/ft16_bwd_ab.log &
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

    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    f, R = 16, 224
    rng = np.random.default_rng(0)
    results = {}

    def scan_timed(name, body, args, iters=3, reps=3):
        @jax.jit
        def run(args):
            def step(carry, _):
                out = body(*args)
                leaves = [l.astype(jnp.float32).sum()
                          for l in jax.tree_util.tree_leaves(out)]
                return carry + sum(leaves) * 1e-9, None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
            return acc

        try:
            float(run(args))
        except Exception as e:
            results[name] = f"{type(e).__name__}"[:40]
            print(json.dumps({name: results[name]}), flush=True)
            return None
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(args))
            times.append((time.perf_counter() - t0) / iters * 1e3)
        ms = float(np.median(times))
        results[name] = round(ms, 1)
        print(json.dumps({name: round(ms, 1)}), flush=True)
        return ms

    video16 = jnp.asarray(rng.normal(size=(16, f, R, R * 3)), jnp.bfloat16)
    params = None
    for bs, remat, tag in ((16, "attn_out", "bs16_attn_out"),
                           (8, "attn_out", "bs8_attn_out"),
                           (8, "none", "bs8_none"),
                           (16, "attn", "bs16_attn")):
        model = SpaceTimeTransformer(
            VideoTowerConfig(num_frames=f, remat=remat), dtype=jnp.bfloat16)
        if params is None:
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0), video16[:1])["params"]
        video = video16[:bs]

        def fwdbwd(p, v, model=model):
            return jax.grad(lambda p: jnp.sum(model.apply(
                {"params": p}, v).astype(jnp.float32)))(p)

        scan_timed(f"tower_fwdbwd_{tag}_ms", fwdbwd, (params, video))

    # input-grads-only at the baseline config
    model = SpaceTimeTransformer(
        VideoTowerConfig(num_frames=f, remat="attn_out"), dtype=jnp.bfloat16)

    def fwdbwd_input(p, v):
        return jax.grad(lambda v: jnp.sum(model.apply(
            {"params": p}, v).astype(jnp.float32)))(v)

    scan_timed("tower_fwdbwd_bs16_attn_out_inputgrad_ms", fwdbwd_input,
               (params, video16))

    print(json.dumps({"metric": "ft16_bwd_ab", "results": results}))


if __name__ == "__main__":
    main()
