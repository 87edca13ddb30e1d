"""Optimizer-tail A/B on the real chip (VERDICT r4 #4).

The r4 4f trace attributes ~23 ms/step to loop fusions, part of which is
the AdamW update's elementwise passes over the 220M-param tree.  This
probe isolates the optimizer: one jitted lax.scan of K updates over the
REAL dual-encoder param tree (donated state, fixed grads), timed by
scalar fetch, with variants interleaved in-session:

  optax        — production optax.adamw chain
  fused        — adamw_fused: same update rule in one tree pass
  fused_bf16mu — adamw_fused with the bf16 first moment (HBM-traffic
                 lever: 0.9 GB less state read+write per step)

Per-call dispatch (~0.55 ms through the tunnel) is amortized over the
K=8 in-scan updates.  Run via nohup (never kill a TPU job):

    nohup python scripts/opt_tail_ab.py > /tmp/opt_ab.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 8           # updates per jitted scan
TIMED = 3       # timed calls per phase
ROUNDS = 3      # interleaved rounds per variant


def main():
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    from egovlp_tpu.models import DualEncoder, DualEncoderConfig
    from egovlp_tpu.train.state import make_optimizer, param_count

    cfg = DualEncoderConfig()
    model = DualEncoder(cfg, dtype=jnp.bfloat16)
    T, R, L = 4, 224, 30
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, R, R * 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32))["params"]
    n = param_count(params)
    print(f"params: {n / 1e6:.1f}M", flush=True)

    @jax.jit
    def make_grads(p):
        return jax.tree_util.tree_map(lambda x: jnp.full_like(x, 1e-3), p)

    grads = make_grads(params)

    variants = {
        "optax": dict(variant="optax"),
        "fused": dict(variant="fused"),
        "fused_bf16mu": dict(variant="fused", mu_dtype="bfloat16"),
    }
    txs = {name: make_optimizer(3e-5, (60, 80), 1000, **kw)
           for name, kw in variants.items()}
    runs = {}
    for name, tx in txs.items():
        def run(p, s, g, tx=tx):
            def body(carry, _):
                p, s = carry
                u, s = tx.update(g, s, p)
                return (optax.apply_updates(p, u), s), ()
            (p, s), _ = jax.lax.scan(body, (p, s), None, length=K)
            return p, s
        runs[name] = jax.jit(run, donate_argnums=(0, 1))

    first_leaf = jax.tree_util.tree_leaves(params)[0]
    results = {name: [] for name in variants}
    for rnd in range(ROUNDS):
        for name in variants:
            p = jax.jit(lambda x: jax.tree_util.tree_map(jnp.copy, x))(params)
            s = jax.jit(txs[name].init)(p)
            p, s = runs[name](p, s, grads)          # warm / compile
            float(jnp.sum(jax.tree_util.tree_leaves(p)[0]))
            t0 = time.perf_counter()
            for _ in range(TIMED):
                p, s = runs[name](p, s, grads)
            float(jnp.sum(jax.tree_util.tree_leaves(p)[0]))
            ms = (time.perf_counter() - t0) / (TIMED * K) * 1e3
            results[name].append(round(ms, 3))
            print(json.dumps({"round": rnd, "variant": name,
                              "ms_per_update": round(ms, 3)}), flush=True)
            del p, s

    del first_leaf
    print(json.dumps({
        "metric": "opt_tail_ab_ms_per_update",
        **{name: round(float(np.median(v)), 3)
           for name, v in results.items()},
        "rounds": results,
        "params_millions": round(n / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
