"""Component profiling on the real chip (run via nohup, never kill)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from egovlp_tpu.models import DualEncoder, DualEncoderConfig, VideoTowerConfig
from egovlp_tpu.data.transforms import random_resized_crop_flip

rng = np.random.default_rng(0)
B, T, R, L, P = 32, 4, 224, 30, 256
results = {}

def timed(name, fn, *a, iters=5):
    r = fn(*a)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    results[name] = round(ms, 1)
    print(f"{name}: {ms:.1f} ms", flush=True)

frames = jnp.asarray(  # device-resident: keep H2D (tunnel, ~0.04 GB/s
    rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8))  # here) out
tf = jax.jit(lambda k, f: random_resized_crop_flip(k, f, out_size=224))
timed("transform", tf, jax.random.PRNGKey(0), frames)

impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
cfg = DualEncoderConfig(video=VideoTowerConfig(attention_impl=impl))
model = DualEncoder(cfg, dtype=jnp.bfloat16)
video = jnp.asarray(rng.normal(size=(B, T, R, R * 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, L)), jnp.int32)
mask = jnp.ones((B, L), jnp.int32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1])["params"]
vf = jax.jit(lambda p, v: model.apply({"params": p}, v, method="encode_video", deterministic=True))
timed(f"video_fwd_{impl}", vf, params, video)
g = jax.jit(jax.grad(lambda p, v: jnp.sum(model.apply({"params": p}, v, method="encode_video", deterministic=True).astype(jnp.float32) ** 2)))
timed(f"video_fwdbwd_{impl}", g, params, video, iters=3)
txt = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m, method="encode_text", deterministic=True))
timed("text_fwd", txt, params, ids, mask)
gt = jax.jit(jax.grad(lambda p, i, m: jnp.sum(model.apply({"params": p}, i, m, method="encode_text", deterministic=True).astype(jnp.float32) ** 2)))
timed("text_fwdbwd", gt, params, ids, mask, iters=3)
print(json.dumps(results))
