"""Interleaved A/B of the fused space-attention kernel bodies (real chip).

v1  = divide-then-matmul softmax, f32 backward dp/dv matmuls (r2/r3).
v2  = exp2-base softmax (log2(e) folded into the q scale), deferred
      normalisation (the value matmul consumes the unnormalized exp; one
      [L, hd] reciprocal multiply replaces the [L, L+1] probability
      divide), and input-dtype (bf16) dp/dv backward matmuls.
v2x = v2 forward + v2 backward with the f32 dp/dv matmuls kept
      (isolates the exp2/deferred-norm VPU savings from the matmul
      dtype change).

The variant is consulted at TRACE time (EGOVLP_SPACE_KERNEL), so this
script flips the env var between freshly-built jits inside ONE process
and interleaves the variants round-robin — this chip's session-to-session
throttle drift can reach ~2x on VPU-heavy programs, so cross-process
comparisons are meaningless (CLAUDE.md).

    nohup python scripts/space_kernel_ab.py v1,v2 4 > ab.log &

argv[1] = comma-separated variants (default v1,v2), argv[2] = rounds
(default 4).  Prints one JSON line per measurement plus a final summary
with per-variant medians.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    from egovlp_tpu.kernels.divided_attention import divided_attention_parts

    variants = (sys.argv[1].split(",") if len(sys.argv) > 1
                else ["v1", "v2"])
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    H, D = 12, 768
    rng = np.random.default_rng(0)
    acc = {}

    def timed(body, x0, iters):
        # fresh closures -> fresh trace -> the env var is re-consulted
        def step(x, _):
            out = body(x)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            return x + (s * 1e-30).astype(x.dtype), None

        @partial(jax.jit, static_argnums=1)
        def run(x0, length):
            x, _ = jax.lax.scan(step, x0, None, length=length)
            return jnp.sum(x.astype(jnp.float32))

        float(run(x0, 1))        # compile both lengths
        float(run(x0, iters))
        t1, tn = [], []
        for _ in range(5):       # tunnel RTT spikes: median of 5 each
            t0 = time.perf_counter()
            float(run(x0, 1))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(x0, iters))
            tn.append(time.perf_counter() - t0)
        return ((float(np.median(tn)) - float(np.median(t1)))
                / (iters - 1) * 1e3)

    shapes = (("4f_B32", 32, 4), ("16f_B16", 16, 16))
    for tag, B, f in shapes:
        n = 196
        q = jnp.asarray(rng.normal(size=(B, f, n, D)) * 0.02, jnp.bfloat16)
        qc = jnp.asarray(rng.normal(size=(B, 1, D)) * 0.02, jnp.bfloat16)

        def att(x, f=f, n=n):
            oc, op = divided_attention_parts(qc, qc, qc, x, x, x, heads=H,
                                             frames=f, patches=n,
                                             axis="space", impl="pallas")
            return (oc, op)

        def att_bwd(x, f=f, n=n):
            def loss(x):
                oc, op = att(x)
                return (jnp.sum(oc.astype(jnp.float32))
                        + jnp.sum(op.astype(jnp.float32)))
            return jax.grad(loss)(x)

        for r in range(rounds):
            for v in variants:
                os.environ["EGOVLP_SPACE_KERNEL"] = v
                fwd = timed(lambda x: att(x), q, iters=24)
                fb = timed(lambda x: att_bwd(x), q, iters=12)
                acc.setdefault((tag, v), []).append((fwd, fb))
                print(json.dumps({"shape": tag, "round": r, "variant": v,
                                  "fwd_ms": round(fwd, 3),
                                  "fwdbwd_ms": round(fb, 3)}), flush=True)

    summary = {"metric": "space_kernel_ab", "rounds": rounds}
    for (tag, v), xs in acc.items():
        summary[f"{tag}_{v}_fwd_ms"] = round(
            float(np.median([a for a, _ in xs])), 3)
        summary[f"{tag}_{v}_fwdbwd_ms"] = round(
            float(np.median([b for _, b in xs])), 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
