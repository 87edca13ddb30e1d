"""Production epoch-loop throughput vs the raw-step roofline (real TPU).

VERDICT r3 #1 done-criterion: `train/recipes.py::_make_train_epoch_fn`
(the loop `cli.train` actually runs) must deliver within ~5% of the
device-only clips/s that `bench.py` advertises.  Before r4 the loop
fetched `float(loss)` after EVERY step — a blocking device round-trip
that serialized JAX async dispatch; now losses stay on device and the
only in-loop syncs are one scalar per `log_step` batches.

Three variants on identical device-resident synthetic batches (in-memory:
no decode, no H2D in the timed region — the tunnel's 0.04 GB/s H2D would
otherwise swamp the loop-structure signal this script isolates):

  raw        — bench.py's pattern: step in a bare loop, one sync at the end
  epoch_fn   — the production `_make_train_epoch_fn`
  per_step   — the pre-r4 behavior (float(loss) every step), for the record

Run on the real chip (never under `timeout`, CLAUDE.md):
    nohup python scripts/trainer_loop_bench.py > /tmp/loop_bench.log 2>&1 &
Prints one JSON line.
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/egovlp_jax_cache")
except Exception:
    pass

from egovlp_tpu.core.mesh import MeshSpec, create_mesh, replicated, shard_batch
from egovlp_tpu.io.logging import MetricLogger
from egovlp_tpu.models import DualEncoder, DualEncoderConfig
from egovlp_tpu.train.recipes import _make_train_epoch_fn
from egovlp_tpu.train.state import create_train_state, make_optimizer
from egovlp_tpu.train.steps import make_egoclip_train_step


class DeviceLoader:
    """Minimal Loader stand-in yielding pre-sharded device batches."""

    def __init__(self, batches, batch_size, steps):
        self.batches = batches
        self.batch_size = batch_size
        self.steps = steps
        self.drop_last = True

    def __len__(self):
        return self.steps

    def epoch(self, epoch):
        for i in range(self.steps):
            yield self.batches[i % len(self.batches)]


def make_batch(rng, B, T, P, vocab):
    L = 30
    return {
        "frames": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "frames_neg": rng.integers(0, 255, (B, T, P, P * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, vocab, (B, L)).astype(np.int32),
        "text_mask": np.ones((B, L), np.int32),
        "text_neg_ids": rng.integers(0, vocab, (B, L)).astype(np.int32),
        "text_neg_mask": np.ones((B, L), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
        "noun_vec_neg": np.eye(B, 582, dtype=np.float32),
        "verb_vec_neg": np.eye(B, 118, dtype=np.float32),
    }


def main():
    cfg = DualEncoderConfig()
    model = DualEncoder(cfg, dtype=jnp.bfloat16)
    B, T, R, P = 16, cfg.video.num_frames, cfg.video.img_size, 256
    rng = np.random.default_rng(0)
    mesh = create_mesh(MeshSpec())

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, R, R, 3), jnp.float32),
        jnp.zeros((1, 30), jnp.int32), jnp.ones((1, 30), jnp.int32),
    )["params"]

    # ONE state lineage donated through every variant: state creation is
    # ~400 eager ops (copy + optax init per leaf) that cost ~2 min of
    # queued tunnel latency here — measured: a per-variant fresh state
    # bleeds that backlog into the variant's first step (122-148 s blocked
    # dispatch, /tmp/vfy/loop_diag.py r4).  The timed region must contain
    # steps only.
    state = jax.device_put(
        create_train_state(model, params,
                           make_optimizer(3e-5, (60, 80), 1000)),
        replicated(mesh))
    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=R,
                                   donate=True)
    batches = [shard_batch(make_batch(rng, B, T, P, cfg.text.vocab_size),
                           mesh) for i in range(3)]

    # compile + warm + drain the state-init op backlog
    key = jax.random.PRNGKey(0)
    for i in range(3):
        state, loss = step(state, batches[i % 3], jax.random.fold_in(key, i))
    float(loss)

    steps = 36
    result = {}

    # --- raw roofline: bare loop, one sync -----------------------------
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, batches[i % 3],
                           jax.random.fold_in(key, 100 + i))
    float(loss)
    result["raw_clips_per_sec"] = B * steps / (time.perf_counter() - t0)

    # --- production epoch fn -------------------------------------------
    logger = logging.getLogger("egovlp_tpu")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    mlog = MetricLogger(None, enabled=False)
    log_step = int(np.sqrt(B)) or 1  # recipes.py's convention (= 4)
    # warm epoch at FULL length: the end-of-epoch loss reduction is one
    # program per epoch length, compiled once in epoch 1 in production
    # (steps_per_epoch is constant across epochs) — a short warm epoch
    # leaks that compile into the timed region (9 s here, r4 harness bug)
    epoch_fn = _make_train_epoch_fn(DeviceLoader(batches, B, steps), step,
                                    mesh, None, log_step, logger)
    state, _ = epoch_fn(state, 1, mlog)
    rates = []
    for e in (2, 3):
        t0 = time.perf_counter()
        state, log = epoch_fn(state, e, mlog)
        rates.append(B * steps / (time.perf_counter() - t0))
    result["epoch_fn_clips_per_sec"] = max(rates)
    result["epoch_fn_epochs"] = [round(r, 3) for r in rates]
    result["epoch_fn_loss"] = log["loss_0"]

    # --- pre-r4 behavior: float(loss) every step ------------------------
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, batches[i % 3],
                           jax.random.fold_in(key, 200 + i))
        float(loss)
    result["per_step_sync_clips_per_sec"] = (
        B * steps / (time.perf_counter() - t0))
    del state

    result = {k: round(v, 3) if isinstance(v, float) else v
              for k, v in result.items()}
    result["epoch_fn_vs_raw"] = round(
        result["epoch_fn_clips_per_sec"] / result["raw_clips_per_sec"], 4)
    result["steps"] = steps
    print(json.dumps(result))


if __name__ == "__main__":
    main()
