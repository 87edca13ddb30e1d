"""EgoClip pretraining throughput benchmark (one JSON line).

Measures the full jitted EgoClip training step on the flagship dual encoder
(ViT-B/16 SpaceTimeTransformer + DistilBERT, 4-frame 224^2 clips, bf16
compute) — on-device transform + forward + EgoNCE over the global batch +
backward + AdamW update — with the reference's training shape: batch 16
samples/chip, each with a scene negative (so 32 clips through the video
tower per step; trainer_egoclip.py:109-113, configs/pt/egoclip.json).

Metric: clips/sec/chip, counting SAMPLES like the reference's
max_samples_per_epoch accounting (negatives are extra compute, not extra
samples).  Baseline: the published pretraining wall-clock — 10 epochs x
500k samples on 32 A100 in ~2 days (README.md:76) = 0.904 samples/s/GPU.
"""

import json
import time

import numpy as np

BASELINE_CLIPS_PER_SEC_PER_CHIP = 500_000 * 10 / (2 * 86400) / 32  # 0.904


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache cuts repeat-run latency
        jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
    except Exception:
        pass

    from egovlp_tpu.models import DualEncoder, DualEncoderConfig
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    cfg = DualEncoderConfig()
    model = DualEncoder(cfg, dtype=jnp.bfloat16)

    B, T, R, L = 16, cfg.video.num_frames, cfg.video.img_size, 30
    P = 256  # host decoder pre-size; frames arrive channel-folded (pipeline.py)
    rng = np.random.default_rng(0)
    batch = {
        "frames": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "frames_neg": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, cfg.text.vocab_size, (B, L)).astype(np.int32),
        "text_mask": np.ones((B, L), np.int32),
        "text_neg_ids": rng.integers(0, cfg.text.vocab_size, (B, L)).astype(np.int32),
        "text_neg_mask": np.ones((B, L), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
        "noun_vec_neg": np.eye(B, 582, dtype=np.float32),
        "verb_vec_neg": np.eye(B, 118, dtype=np.float32),
    }

    video = jnp.zeros((1, T, R, R, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), video,
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )["params"]
    tx = make_optimizer(3e-5, (60, 80), steps_per_epoch=1000)
    state = create_train_state(model, params, tx)
    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=R)

    # warmup / compile
    key = jax.random.PRNGKey(0)
    state, loss = step(state, batch, key)
    loss.block_until_ready()
    for i in range(3):
        state, loss = step(state, batch, jax.random.fold_in(key, i))
    loss.block_until_ready()

    # the dev chip is shared/throttled with ~2x run-to-run variance;
    # report the median of three trials (float(loss) forces a full sync
    # through the sequential state dependency)
    iters = 12
    rates = []
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = step(state, batch,
                               jax.random.fold_in(key, 100 + trial * iters + i))
        float(loss)
        rates.append(B * iters / (time.perf_counter() - t0))
    n_chips = jax.device_count()
    clips_per_sec_per_chip = sorted(rates)[1] / n_chips
    print(json.dumps({
        "metric": "egoclip_train_clips_per_sec_per_chip",
        "value": round(clips_per_sec_per_chip, 3),
        "unit": "clips/s/chip (batch 16 + scene negatives, 4f 224^2, bf16)",
        "vs_baseline": round(
            clips_per_sec_per_chip / BASELINE_CLIPS_PER_SEC_PER_CHIP, 2
        ),
    }))


if __name__ == "__main__":
    main()
