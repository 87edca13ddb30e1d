"""Device-trace profiler for the production train steps (r4 workhorse).

Captures a jax.profiler trace of N steps of either the 4f EgoClip
flagship step or the 16f EPIC fine-tune step on the real chip, parses
the xplane with xprof's hlo_stats tool, and prints per-category device
self-time plus the top ops.  This is the tool that found every r4 perf
item (the 100 ms/step XLA time-attention bill, the v1 kernel's lane
reductions, the remat flip) — prefer it over cost_analysis byte
counting, which overcounts fusion-internal traffic (docs/ROUND4.md §4).

    nohup python scripts/trace_profile.py 4f  > /tmp/prof.log 2>&1 &
    nohup python scripts/trace_profile.py 16f > /tmp/prof.log 2>&1 &

Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the parse step
(set automatically); the tensorflow-bundled tbp wrapper is broken in
this environment.
"""
import collections
import glob
import json
import os
import re
import shutil
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(mode):
    import jax
    import jax.numpy as jnp

    from egovlp_tpu.core.mesh import (MeshSpec, create_mesh, replicated,
                                      shard_batch)
    from egovlp_tpu.models import (DualEncoder, DualEncoderConfig,
                                   VideoTowerConfig)
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import (make_egoclip_train_step,
                                        make_epic_train_step)

    rng = np.random.default_rng(0)
    P, L, R = 256, 30, 224
    if mode == "16f":
        cfg = DualEncoderConfig(video=VideoTowerConfig(num_frames=16,
                                                       remat=False))
        mu = "bfloat16"
        Bf = 16
        batch = {
            "frames": rng.integers(0, 255, (Bf, 16, P, P * 3)).astype(
                np.uint8),
            "text_ids": rng.integers(0, cfg.text.vocab_size,
                                     (Bf, L)).astype(np.int32),
            "text_mask": np.ones((Bf, L), np.int32),
        }
        step = make_epic_train_step(loss_type="MaxMarginRankingLoss",
                                    input_res=R, donate=True)
        T = 16
    else:
        cfg = DualEncoderConfig()
        mu = None
        B = 16
        batch = {
            "frames": rng.integers(0, 255, (B, 4, P, P * 3)).astype(np.uint8),
            "frames_neg": rng.integers(0, 255, (B, 4, P, P * 3)).astype(
                np.uint8),
            "text_ids": rng.integers(0, cfg.text.vocab_size,
                                     (B, L)).astype(np.int32),
            "text_mask": np.ones((B, L), np.int32),
            "text_neg_ids": rng.integers(0, cfg.text.vocab_size,
                                         (B, L)).astype(np.int32),
            "text_neg_mask": np.ones((B, L), np.int32),
            "noun_vec": np.eye(B, 582, dtype=np.float32),
            "verb_vec": np.eye(B, 118, dtype=np.float32),
            "noun_vec_neg": np.eye(B, 582, dtype=np.float32),
            "verb_vec_neg": np.eye(B, 118, dtype=np.float32),
        }
        step = make_egoclip_train_step(loss_type="EgoNCE", input_res=R,
                                       donate=True)
        T = 4

    model = DualEncoder(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, R, R * 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32))["params"]
    state = create_train_state(model, params,
                               make_optimizer(3e-5, (60, 80), 1000,
                                              mu_dtype=mu))
    mesh = create_mesh(MeshSpec())
    state = jax.device_put(state, replicated(mesh))
    return step, state, shard_batch(batch, mesh)


def parse(xplane, n_steps):
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats^", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    rows = [r["c"] for r in d["rows"]]
    cat = collections.Counter()
    for r in rows:
        cat[r[2]["v"]] += float(r[9]["v"] or 0)
    total = sum(cat.values())
    print(f"\ntotal device self time: {total / n_steps / 1e3:.1f} ms/step")
    for k, v in cat.most_common(10):
        print(f"  {v / n_steps / 1e3:8.2f} ms/step  {k}")
    # custom-call (Pallas kernel) split
    cc = collections.Counter()
    for r in rows:
        if r[2]["v"] == "custom-call":
            cc[re.sub(r"[.\d]+$", "", r[3]["v"])] += float(r[9]["v"] or 0)
    if cc:
        print("custom-calls:")
        for k, v in cc.most_common(6):
            if v:
                print(f"  {v / n_steps / 1e3:8.2f} ms/step  {k}")
    # top 10 ops
    rows.sort(key=lambda r: -float(r[9]["v"] or 0))
    print("top ops (ms/step, occurrences, bound-by):")
    for r in rows[:10]:
        print(f"  {float(r[9]['v']) / n_steps / 1e3:7.2f} x{r[6]['v']:>4} "
              f"{(r[21]['v'] if r[21] else '?'):>8}  {r[3]['v'][:50]}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "4f"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass
    step, state, batch = build_step(mode)
    key = jax.random.PRNGKey(0)
    state, loss = step(state, batch, key)
    print("warm", float(loss), flush=True)
    for i in range(2):
        state, loss = step(state, batch, jax.random.fold_in(key, i))
    float(loss)

    outdir = f"/tmp/egovlp_trace_{mode}"
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for i in range(n_steps):
            state, loss = step(state, batch, jax.random.fold_in(key, 10 + i))
        print("traced", float(loss), flush=True)
    files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane written under {outdir}"
    parse(files[0], n_steps)


if __name__ == "__main__":
    main()
