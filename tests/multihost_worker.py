"""Worker for the multi-process distributed tests (see test_multihost_proc).

argv: coordinator rank num_processes mode

Each process owns 2 virtual CPU devices, initializes jax.distributed, and:

  mode=step    builds its shard of a synthetic EgoClip batch in-line and
               runs ONE sharded EgoNCE train step over the global mesh —
               exercising make_array_from_process_local_data and the
               cross-process collectives. Prints LOSS=<value>.
  mode=loader  decodes its per-process shard with the REAL Loader
               (shard_indices DistributedSampler semantics) and runs the
               same step — the loss must equal the single-process oracle
               the parent test computes on the identical global batch.
"""

import os
import sys

coordinator, rank, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "step"
# mode=task compares topologies at a FIXED global chip count (4): the
# single-process oracle owns all 4 virtual devices, 2 processes own 2 each
_dev = max(1, 4 // nprocs) if mode == "task" else 2
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={_dev}"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nprocs, process_id=rank)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from egovlp_tpu.core.mesh import MeshSpec, create_mesh, replicated, shard_batch

assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == _dev * nprocs

if mode == "task":
    # full config-driven run_task under jax.distributed: train epoch(s) +
    # EgoMCQ val (cross-process gather) + Orbax checkpoint (+ resume when a
    # checkpoint path is given) — the cli-level multi-host path, end to end
    import json

    from egovlp_tpu.io.config import Config
    from egovlp_tpu.train.recipes import run_task

    config = Config(json.load(open(sys.argv[5])))
    resume = sys.argv[6] if len(sys.argv) > 6 and sys.argv[6] != "-" else None
    state = run_task(config, resume=resume)
    print(f"TASKDONE step={int(state.step)}", flush=True)
    sys.exit(0)

mesh = create_mesh(MeshSpec())

if mode == "loader":
    from synth_ds import first_batch_loss

    loss = first_batch_loss(mesh, shards=[rank], num_shards=nprocs,
                            per_shard_batch=4)
    print(f"LOSS={loss:.6f}", flush=True)
    sys.exit(0)

if mode == "eval":
    # distributed evaluation: each process evaluates only its loader shard
    # (10 items over N processes -> uneven + padded shards); the eval's
    # internal cross-process gather (core/dist_eval.py) must make every
    # process report the FULL-dataset metric
    import json

    from synth_ds import oscc_eval_metrics

    m = oscc_eval_metrics(rank, nprocs)
    print(f"METRICS={json.dumps(m, sort_keys=True)}", flush=True)
    sys.exit(0)

# mode=step     gathered-similarity EgoNCE (the default production path)
# mode=ring     the same step with global_sim='ring' (shard_map + ppermute
#               across PROCESS boundaries) — LOSS must equal mode=step
from egovlp_tpu.models import (
    DualEncoder,
    DualEncoderConfig,
    TextTowerConfig,
    VideoTowerConfig,
)
from egovlp_tpu.train.state import create_train_state, make_optimizer
from egovlp_tpu.train.steps import make_egoclip_train_step

res = 32
cfg = DualEncoderConfig(
    video=VideoTowerConfig(img_size=res, patch_size=16, embed_dim=24,
                           depth=1, num_heads=2, num_frames=2),
    text=TextTowerConfig(vocab_size=32, dim=24, n_layers=1, n_heads=2,
                         hidden_dim=48, max_position_embeddings=8),
    projection_dim=8,
)
model = DualEncoder(cfg)
video = jnp.zeros((1, 2, res, res, 3), jnp.float32)
params = model.init(jax.random.PRNGKey(0), video,
                    jnp.zeros((1, 4), jnp.int32),
                    jnp.ones((1, 4), jnp.int32))["params"]

tx = make_optimizer(1e-4, (60,), 10)
state = create_train_state(model, params, tx)
state = jax.device_put(state, replicated(mesh))

# per-process LOCAL slice of the global batch (4 items per process)
rng = np.random.default_rng(rank)
local = {
    "frames": rng.integers(0, 255, (4, 2, res, res * 3)).astype(np.uint8),
    "text_ids": rng.integers(0, 32, (4, 4)).astype(np.int32),
    "text_mask": np.ones((4, 4), np.int32),
    "noun_vec": np.eye(4, 582, dtype=np.float32),
    "verb_vec": np.eye(4, 118, dtype=np.float32),
}
batch = shard_batch(local, mesh)
assert batch["frames"].shape[0] == 4 * nprocs  # global batch assembled

step = make_egoclip_train_step(
    loss_type="EgoNCE", input_res=res,
    global_sim=("ring" if mode == "ring" else "gather"))
with mesh:
    if mode == "ring":
        # non-vacuous: the explicit ppermute ring must be in the traced
        # program — a silent fallback to the gathered path (the r3
        # mesh-detection bug class) would still produce equal losses
        from egovlp_tpu.train.steps import numeric_batch

        hlo = step.jitted.lower(state, numeric_batch(batch),
                                jax.random.PRNGKey(0)).as_text()
        assert "collective_permute" in hlo, "ring path not traced"
    state, loss = step(state, batch, jax.random.PRNGKey(0))
print(f"LOSS={float(loss):.6f}", flush=True)
