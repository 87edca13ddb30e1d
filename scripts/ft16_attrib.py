"""16f backward-cost attribution with an elision-proof timing harness.

THE TIMING PITFALL (cost a day of bogus numbers — see git history of
ft16_wgrad_probe.py): inside `lax.scan`, XLA both (a) hoists
loop-INVARIANT computations out of the loop and (b) slices a
dot_general down to the one element you actually consume.  Timing a
matmul by scanning `out = a @ b` over constant operands and summing one
element measures NEITHER the matmul nor the loop — mostly per-dispatch
tunnel jitter (3-28 ms here).  Every body below therefore (1) consumes
the FULL output (f32 sum — forces the whole computation) and (2) feeds
that sum back into the operand/params (broadcast add of sum*0.0 — a
data dependency XLA cannot hoist, and exactly free after fusion).

Sanity anchor: the tower fwd+bwd number must reproduce the bench's
ft16 step time (~900 ms) measured on real evolving train state.

Run via nohup:  nohup python scripts/ft16_attrib.py &
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

    from egovlp_tpu.kernels.divided_attention import divided_attention_bsd
    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    B, f, n, D, H, R = 16, 16, 196, 768, 12, 224
    S = 1 + f * n
    rng = np.random.default_rng(0)
    results = {}

    def chain_timed(name, body, x0, consts=(), iters=8, reps=3,
                    min_total_ms=250.0):
        """Median ms/iter of ``body(x, *consts) -> tree``.  The f32 sum of
        EVERY output leaf is broadcast-added (times 0.0 — the dependency
        survives, the value doesn't perturb) into the carried operand."""

        def step(x, _):
            out = body(x, *consts)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            # 1e-30 * s: data-dependent (unfoldable) yet a numerical no-op
            # after the bf16 rounding of the add
            return x + (s * 1e-30).astype(x.dtype), None

        from functools import partial

        @partial(jax.jit, static_argnums=2)
        def run(x0, consts, length):
            x, _ = jax.lax.scan(step, x0, None, length=length)
            return jnp.sum(x.astype(jnp.float32))

        try:
            t0 = time.perf_counter()
            float(run(x0, consts, 1))
            float(run(x0, consts, iters))  # compile both lengths + warm
        except Exception as e:
            results[name] = f"{type(e).__name__}"[:40]
            print(json.dumps({name: results[name]}), flush=True)
            return
        t1, tn = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0, consts, 1))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(x0, consts, iters))
            tn.append(time.perf_counter() - t0)
        # (N-iter - 1-iter) / (N-1): dispatch overhead and the warmup
        # iteration cancel without a separate (jittery) overhead probe
        ms = (float(np.median(tn)) - float(np.median(t1))) / (iters - 1) * 1e3
        results[name] = round(ms, 2)
        print(json.dumps({name: results[name],
                          "total_ms": round(float(np.median(tn)) * 1e3, 1)}),
              flush=True)
        return ms

    # ---- matmul ceiling + the wgrad shapes --------------------------------
    mm = 4096
    a4 = jnp.asarray(rng.normal(size=(mm, mm)) * 0.01, jnp.bfloat16)
    chain_timed("square_4096_ms[137g]", lambda a: a @ a, a4, iters=48)

    K = B * S  # 50192: every Dense site's fused batch*seq dim at 16f
    x = jnp.asarray(rng.normal(size=(K, D)) * 0.01, jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(K, 4 * D)) * 0.01, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, 4 * D)) * 0.01, jnp.bfloat16)
    chain_timed("wgrad_fc1_ms[237g]", lambda x, dy: x.T @ dy, x, (dy,),
                iters=32)
    chain_timed("fwd_fc1_ms[237g]", lambda x, w: x @ w, x, (w1,), iters=32)

    # ---- attention ops, evolving q ----------------------------------------
    q = jnp.asarray(rng.normal(size=(B, S, D)) * 0.02, jnp.bfloat16)
    for axis, impl in (("time", "xla"), ("time", "pallas"),
                       ("space", "pallas"), ("space", "xla")):
        def att(q, axis=axis, impl=impl):
            return divided_attention_bsd(q, q, q, heads=H, frames=f,
                                         patches=n, axis=axis, impl=impl)

        def att_bwd(q, axis=axis, impl=impl):
            return jax.grad(lambda q: jnp.sum(divided_attention_bsd(
                q, q, q, heads=H, frames=f, patches=n, axis=axis,
                impl=impl).astype(jnp.float32)))(q)

        chain_timed(f"{axis}_attn_{impl}_fwd_ms", att, q, iters=24)
        chain_timed(f"{axis}_attn_{impl}_fwdbwd_ms", att_bwd, q, iters=12)

    # ---- tower: fwd / full grads / input-grads-only, params evolving ------
    video = jnp.asarray(rng.normal(size=(B, f, R, R * 3)), jnp.bfloat16)
    model = SpaceTimeTransformer(
        VideoTowerConfig(num_frames=f, remat="attn_out"), dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video[:1])["params"]
    flat, tree = jax.tree_util.tree_flatten(params)

    def tower_fwd(v, params):
        return model.apply({"params": params}, v)

    chain_timed("tower_fwd_ms", tower_fwd, video, (params,), iters=8)

    def loss(params, v):
        return jnp.sum(model.apply({"params": params}, v).astype(jnp.float32))

    def tower_wgrad_step(v, params):
        # full grads; chain through v (params stay const — grads themselves
        # are consumed by the harness's full-sum feedback)
        return jax.grad(loss)(params, v)

    chain_timed("tower_fwdbwd_full_ms", tower_wgrad_step, video, (params,),
                iters=4)

    def tower_igrad(v, params):
        return jax.grad(loss, argnums=1)(params, v)

    chain_timed("tower_fwdbwd_inputgrads_ms", tower_igrad, video, (params,),
                iters=4)

    print(json.dumps({"metric": "ft16_attrib", "results": results}))


if __name__ == "__main__":
    main()
