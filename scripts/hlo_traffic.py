"""HBM-traffic audit of the 16f video-tower gradient: where the bytes go.

The 16f fine-tune step is MEMORY-bound (XLA cost analysis: ~460-527 GB
accessed per step vs a 37.5-TFLOP compute load — docs/ROUND3.md), so the
optimization loop for it is: compile the tower grad for the real chip,
histogram the pure LAYOUT ops (copy / slice / layout-changing reshape) by
shape, and attack the biggest lines.  This script is that audit, kept as a
tool because it has already paid for itself twice (found the 160 MB/block
k/v-group splices that became the pair-layout time path, and the 14.8 GB
of f32 LayerNorm residuals that became kernels/fused_ln.py).

Compile-only: it lowers for whatever backend jax resolves (the real TPU
through the tunnel — layout copies are a TPU-compiler artifact, a CPU HLO
would not show them), writes the optimized HLO next to the log, and prints
per-op-kind byte histograms plus the cost-analysis totals.  Nothing
executes on the chip.

Usage:  nohup python scripts/hlo_traffic.py [remat] [impl] [frames] &
        (defaults: attn_out auto 16)
"""
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DT = {"f32": 4, "bf16": 2, "u16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
      "pred": 1, "f16": 2, "s16": 2}


def shape_nbytes(s: str) -> int:
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt = DT.get(m.group(1))
        if dt is None:
            continue
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * dt
    return total


def histogram(entry: str, op: str):
    hist, cnt = collections.Counter(), collections.Counter()
    pat = (r"^\s+(?:ROOT )?[%\w.\-]+ = "
           r"((?:\([^)]*\)|[\w]+\[[^\]]*\](?:\{[^}]*\})?)) " + op + r"\(")
    for mm in re.finditer(pat, entry, re.M):
        key = re.sub(r"\{[^}]*\}", "", mm.group(1))
        hist[key] += 2 * shape_nbytes(mm.group(1))  # read + write
        cnt[key] += 1
    return hist, cnt


def main():
    remat = sys.argv[1] if len(sys.argv) > 1 else "attn_out"
    impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    B, R = 16, 224
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, frames, R, R * 3)), jnp.bfloat16)
    model = SpaceTimeTransformer(
        VideoTowerConfig(num_frames=frames, attention_impl=impl,
                         remat=(False if remat == "none" else remat)),
        dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video[:1])["params"]

    def loss(params, v):
        return jnp.sum(model.apply({"params": params}, v)
                       .astype(jnp.float32))

    comp = jax.jit(jax.grad(loss, argnums=0)).lower(params, video).compile()
    txt = comp.as_text()
    hlo_path = f"/tmp/tower_grad_{remat}_{impl}_{frames}f.hlo"
    open(hlo_path, "w").write(txt)
    entry = txt[txt.index("ENTRY "):]

    try:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        totals = {"bytes_accessed_gb": round(ca.get("bytes accessed", 0)
                                             / 1e9, 1),
                  "flops_tf": round(ca.get("flops", 0) / 1e12, 2)}
    except Exception as e:
        totals = {"cost_analysis_error": str(e)[:100]}
    print(json.dumps({"remat": remat, "impl": impl, "frames": frames,
                      "hlo": hlo_path, **totals}), flush=True)

    for op in ("copy", "slice", "reshape", "transpose"):
        hist, cnt = histogram(entry, op)
        print(f"== {op} total GB (r+w): {sum(hist.values()) / 1e9:.1f}")
        for k, b in hist.most_common(10):
            print(f"   {b / 1e9:6.2f} GB  x{cnt[k]:<4d} {k}")


if __name__ == "__main__":
    main()
