"""Synthetic in-memory EgoClip-shaped dataset for multi-host tests.

Every field is a deterministic function of the item index alone, so any
process decoding item i produces bit-identical content — which lets the
multi-host tests compare per-shard loading against a single-process global
batch numerically.
"""

import numpy as np

from egovlp_tpu.data.datasets.base import DatasetConfig

RES = 32
FRAMES = 2
TEXT_LEN = 4
VOCAB = 32


class SynthEgoClipDataset:
    """Loader-protocol dataset (len + get(idx, rng)); ignores the rng so
    content is purely index-determined."""

    def __init__(self, n: int = 64):
        self.n = n
        self.cfg = DatasetConfig(split="train", num_frames=FRAMES,
                                 pre_size=RES)

    def __len__(self):
        return self.n

    def get(self, idx: int, rng: np.random.Generator):
        g = np.random.default_rng(1000 + idx)
        return {
            "frames": g.integers(0, 255, (FRAMES, RES, RES, 3)).astype(
                np.uint8),
            "text_ids": g.integers(0, VOCAB, TEXT_LEN).astype(np.int32),
            "text_mask": np.ones(TEXT_LEN, np.int32),
            "noun_vec": np.eye(582, dtype=np.float32)[idx % 582],
            "verb_vec": np.eye(118, dtype=np.float32)[idx % 118],
        }


def tiny_dual_encoder():
    """The shared tiny model + deterministic params both the workers and the
    single-process oracle build (identical seeds => identical params)."""
    import jax
    import jax.numpy as jnp

    from egovlp_tpu.models import (
        DualEncoder,
        DualEncoderConfig,
        TextTowerConfig,
        VideoTowerConfig,
    )

    cfg = DualEncoderConfig(
        video=VideoTowerConfig(img_size=RES, patch_size=16, embed_dim=24,
                               depth=1, num_heads=2, num_frames=FRAMES),
        text=TextTowerConfig(vocab_size=VOCAB, dim=24, n_layers=1, n_heads=2,
                             hidden_dim=48, max_position_embeddings=8),
        projection_dim=8,
    )
    model = DualEncoder(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, FRAMES, RES, RES, 3), jnp.float32),
        jnp.zeros((1, TEXT_LEN), jnp.int32),
        jnp.ones((1, TEXT_LEN), jnp.int32),
    )["params"]
    return model, params


def shard_first_batch(shard: int, num_shards: int, per_shard_batch: int,
                      seed: int = 5):
    """Decode one shard's first batch with the REAL Loader (threaded decode,
    channel-folding collate, DistributedSampler-equivalent shard_indices)."""
    from egovlp_tpu.data.pipeline import Loader

    loader = Loader(SynthEgoClipDataset(), batch_size=per_shard_batch,
                    shuffle=True, seed=seed, num_workers=2, shard=shard,
                    num_shards=num_shards)
    batch = next(iter(loader.epoch(0)))
    return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}


def first_batch_loss(mesh, *, shards, num_shards: int,
                     per_shard_batch: int, seed: int = 5) -> float:
    """Concatenate the given shards' first batches in rank order (exactly
    the global assembly `jax.make_array_from_process_local_data` performs:
    each process's slice occupies its devices' contiguous block), shard over
    the mesh, and run one EgoClip train step; returns the global loss.

    Multi-host workers pass ``shards=[rank]`` (their local slice); the
    single-process oracle passes ``shards=range(num_shards)`` on a 1-device
    mesh to reproduce the identical global batch.
    """
    import jax

    from egovlp_tpu.core.mesh import replicated, shard_batch
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    parts = [shard_first_batch(r, num_shards, per_shard_batch, seed)
             for r in shards]
    batch = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    model, params = tiny_dual_encoder()
    tx = make_optimizer(1e-4, (60,), 10)
    state = create_train_state(model, params, tx)
    state = jax.device_put(state, replicated(mesh))
    global_batch = shard_batch(batch, mesh)

    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=RES)
    with mesh:
        _, loss = step(state, global_batch, jax.random.PRNGKey(0))
    return float(loss)


class SynthOSCCDataset:
    """Tiny video-classification eval dataset (n=9: ODD, so 2-way
    non-drop_last sharding pads one shard and the distributed-eval gather
    must really dedupe — review r3 caught the previous n=10 dividing
    evenly, making the pad path untested)."""

    def __init__(self, n: int = 9):
        self.n = n
        self.cfg = DatasetConfig(split="test", num_frames=FRAMES,
                                 pre_size=RES)

    def __len__(self):
        return self.n

    def get(self, idx: int, rng: np.random.Generator):
        g = np.random.default_rng(2000 + idx)
        return {
            "frames": g.integers(0, 255, (FRAMES, RES, RES, 3)).astype(
                np.uint8),
            "state": np.int32(idx % 2),
        }


def oscc_eval_metrics(shard: int, num_shards: int) -> dict:
    """Run the OSCC eval over this process's shard of the synthetic
    dataset; multi-process runs gather across shards inside
    `_collect_logits`.  Besides the (permutation-invariant) accuracy, an
    ORDER-SENSITIVE digest of the gathered logits pins dataset-order
    restoration and pad-dedup (row count enters via the weights)."""
    from egovlp_tpu.data.pipeline import Loader
    from egovlp_tpu.evals.oscc_pnr import _collect_logits
    from egovlp_tpu.metrics.oscc_pnr import oscc_metrics

    model, params = tiny_dual_encoder()
    loader = Loader(SynthOSCCDataset(), batch_size=3, shuffle=False,
                    drop_last=False, num_workers=2, shard=shard,
                    num_shards=num_shards)
    logits, ex = _collect_logits(model, params, loader, RES, ("state",))
    m = oscc_metrics(logits, ex["state"])
    w = np.arange(1, len(logits) + 1)[:, None]
    m["order_digest"] = round(float(np.sum(logits * w)), 4)
    m["rows"] = int(len(logits))
    return m
