"""A/B the fused time-attention kernel bodies on the real chip.

v1 = fi-batched VPU bodies (r2/r3): per-head 64-lane tiles, per-head LANE
reductions for every q.k contraction.  v2 = MXU-segmented bodies
(EGOVLP_TIME_KERNEL, pallas_attention._mk_time_*_bsd_v2): whole 128-lane
blocks, per-head contractions as skinny matmuls against a block-diagonal
segment matrix, shared row max, deferred normalisation.

The variant is chosen at trace time from EGOVLP_TIME_KERNEL, so each run
of this script times ONE variant (scan-amortized inside a single jit —
per-call dispatch through the tunnel is ~0.55 ms and would swamp the
kernel):

    EGOVLP_TIME_KERNEL=v1 nohup python scripts/time_kernel_ab.py > a.log &
    # wait, then:
    EGOVLP_TIME_KERNEL=v2 nohup python scripts/time_kernel_ab.py > b.log &

Shapes: the 4f flagship (B=32 from frames+frames_neg) and the 16f
fine-tune (B=16).  Prints one JSON line per measurement.
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

    variant = os.environ.get("EGOVLP_TIME_KERNEL", "v2")
    H, D = 12, 768
    rng = np.random.default_rng(0)
    results = {"variant": variant}

    def timed(name, body, x0, iters, reps=3):
        def step(x, _):
            out = body(x)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            return x + (s * 1e-30).astype(x.dtype), None

        @partial(jax.jit, static_argnums=1)
        def run(x0, length):
            x, _ = jax.lax.scan(step, x0, None, length=length)
            return jnp.sum(x.astype(jnp.float32))

        try:
            float(run(x0, 1))
            float(run(x0, iters))
        except Exception as e:
            results[name] = f"{type(e).__name__}: {e}"[:120]
            print(json.dumps({name: results[name]}), flush=True)
            return
        t1, tn = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0, 1))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(x0, iters))
            tn.append(time.perf_counter() - t0)
        ms = (float(np.median(tn)) - float(np.median(t1))) / (iters - 1) * 1e3
        results[name] = round(ms, 3)
        print(json.dumps({name: results[name]}), flush=True)

    for tag, B, f in (("4f_B32", 32, 4), ("16f_B16", 16, 16)):
        n = 196
        q = jnp.asarray(rng.normal(size=(B, f, n, D)) * 0.02, jnp.bfloat16)
        qc = jnp.asarray(rng.normal(size=(B, 1, D)) * 0.02, jnp.bfloat16)

        def att(x, B=B, f=f, n=n):
            oc, op = divided_attention_parts(qc, qc, qc, x, x, x, heads=H,
                                             frames=f, patches=n,
                                             axis="time", impl="pallas")
            return (oc, op)

        def att_bwd(x, B=B, f=f, n=n):
            def loss(x):
                oc, op = divided_attention_parts(qc, qc, qc, x, x, x,
                                                 heads=H, frames=f,
                                                 patches=n, axis="time",
                                                 impl="pallas")
                return (jnp.sum(oc.astype(jnp.float32))
                        + jnp.sum(op.astype(jnp.float32)))
            return jax.grad(loss)(x)

        timed(f"time_{tag}_fwd_ms", att, q, iters=24)
        timed(f"time_{tag}_fwdbwd_ms", att_bwd, q, iters=12)

    print(json.dumps({"metric": "time_kernel_ab", **results}))


if __name__ == "__main__":
    main()
