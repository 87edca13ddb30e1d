"""Interleaved 16-frame attention-impl A/B: full-Pallas vs mixed (time on XLA).

A one-shot probe left open at the end of round 3: sequential timing showed
the video tower fwd+bwd at the EPIC fine-tune shape (16f, 224^2, bs 16,
remat='attn_out') at 917 ms full-Pallas vs 896 ms mixed — a 2.3% gap that
is within this chip's session throttle drift.  This script interleaves the
two variants round-robin inside one process so the drift cancels, and
reports per-round ms plus medians.  The decision rule: only flip the 'auto'
policy if one side wins every round by >1.5%.

Run via nohup (never kill a TPU job):  nohup python scripts/attn16_ab.py &
Optional first arg = frame count (default 16) to locate the crossover;
optional second arg = comma-separated impl variants (default
``pallas,mixed``; e.g. ``mixed,xla`` asks whether the Pallas SPACE kernel
still pays at 16f once its operand-layout copies are counted).

Measured (interleaved, this chip): f=16 mixed wins 6/6 rounds, +2.1%
(900.9 vs 920.0 ms); f=4 the fused time kernel wins ~29% at the full-step
level (433 vs 336 ms, docs/ROUND2.md) — hence the frame-aware 'auto'
policy in models/video_tower.py.
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

    B, T, R = 16, int(sys.argv[1]) if len(sys.argv) > 1 else 16, 224
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["pallas", "mixed"])
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((B, T, R, R * 3), np.float32),
                         jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    steps = {}
    params = None
    for name, impl in [(v, v) for v in variants]:
        model = SpaceTimeTransformer(
            VideoTowerConfig(num_frames=T, attention_impl=impl,
                             remat="attn_out"),
            dtype=jnp.bfloat16)
        if params is None:  # identical tree for both impls
            params = jax.jit(model.init)(key, frames[:1])["params"]

        def loss_fn(p, x, model=model):
            return jnp.sum(model.apply({"params": p}, x).astype(jnp.float32))

        steps[name] = jax.jit(jax.value_and_grad(loss_fn))

    # compile both, then one warm iteration each
    for name, st in steps.items():
        t0 = time.perf_counter()
        v, g = st(params, frames)
        float(v)
        print(json.dumps({"compiled": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    rounds, iters = 6, 3
    times = {k: [] for k in steps}
    for r in range(rounds):
        for name, st in steps.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                v, g = st(params, frames)
            float(v) + float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)))
            times[name].append((time.perf_counter() - t0) / iters * 1e3)
        print(json.dumps({"round": r,
                          **{k: round(times[k][-1], 1) for k in times}}),
              flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    summary = {
        "metric": "attn16_ab_fwd_bwd_ms",
        "median": {k: round(v, 1) for k, v in med.items()},
        "per_round": {k: [round(x, 1) for x in v] for k, v in times.items()},
    }
    # pairwise win/speedup lines vs the FIRST variant (any variant count)
    a = variants[0]
    for b in variants[1:]:
        summary[f"{b}_wins_rounds_vs_{a}"] = sum(
            y < x for x, y in zip(times[a], times[b]))
        summary[f"{b}_speedup_pct_vs_{a}"] = round(
            (med[a] / med[b] - 1) * 100, 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
