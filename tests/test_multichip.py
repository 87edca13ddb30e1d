"""Multi-chip semantics on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from egovlp_tpu.core.collectives import (
    all_gather_from_data_axis,
    chunked_global_similarity,
)
from egovlp_tpu.core.mesh import DATA_AXIS, MeshSpec, create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshSpec())


def test_mesh_shape(mesh):
    assert mesh.shape[DATA_AXIS] == 8


def test_all_gather_concat_semantics(mesh, rng):
    x = rng.normal(size=(16, 4)).astype(np.float32)

    f = shard_map(
        lambda a: all_gather_from_data_axis(a),
        mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
            check_vma=False,
    )
    out = f(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-6)


def test_all_gather_grad_is_local_slice(mesh, rng):
    """d/dx sum(g * allgather(x)) == g — the AllGather_multi contract
    (trainer_egoclip.py:22-27): each shard receives its own slice of the
    upstream gradient."""
    x = rng.normal(size=(8, 4)).astype(np.float32)
    g = rng.normal(size=(8, 4)).astype(np.float32)

    def loss(a):
        f = shard_map(
            lambda t: all_gather_from_data_axis(t),
            mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
            check_vma=False,
        )
        return jnp.sum(f(a) * g)

    grad = jax.grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), g, rtol=1e-6)


def test_chunked_global_similarity(mesh, rng):
    """The ppermute-ring similarity equals the dense local @ global.T."""
    a = rng.normal(size=(16, 6)).astype(np.float32)
    b = rng.normal(size=(16, 6)).astype(np.float32)

    f = shard_map(
        lambda la, lb: chunked_global_similarity(la, lb),
        mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False,
    )
    got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    want = a @ b.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(jax.jit(fn), *args)
    assert out.shape == (4, 4)


def test_tensor_parallel_dpxtp_matches_data_parallel(rng):
    """A (data=4, model=2) mesh with Megatron-style param shardings
    computes the same EgoNCE train-step loss as the pure-DP 8-way mesh —
    and the MLP/attention projections are REALLY sharded (half-size
    addressable shards), so GSPMD collectives are exercised end-to-end."""
    from egovlp_tpu.core.mesh import MODEL_AXIS, replicated, shard_batch
    from egovlp_tpu.core.tp import shard_state_tp, tp_shardings
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
                               depth=2, num_heads=2, num_frames=2,
                               attention_impl="xla"),
        text=TextTowerConfig(vocab_size=64, dim=24, n_layers=2, n_heads=2,
                             hidden_dim=48, max_position_embeddings=16),
        projection_dim=8,
    )
    model = DualEncoder(cfg)
    B = 16
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, res, res, 3), jnp.float32),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    tx = make_optimizer(1e-4, (60,), 10)

    host_batch = {
        "frames": rng.integers(0, 255, (B, 2, res, res * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, 64, (B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
    }

    def run(mesh_spec, tp):
        from egovlp_tpu.train.state import create_train_state

        mesh = create_mesh(mesh_spec)
        step = make_egoclip_train_step(loss_type="EgoNCE", input_res=res)
        state = create_train_state(model, params, tx)
        state = (shard_state_tp(state, mesh) if tp
                 else jax.device_put(state, replicated(mesh)))
        batch = shard_batch(host_batch, mesh)
        with mesh:
            new_state, loss = step(state, batch, jax.random.PRNGKey(0))
        return mesh, new_state, float(loss)

    _, _, loss_dp = run(MeshSpec(), tp=False)                 # 8 x 1
    mesh, new_state, loss_tp = run(MeshSpec(data=4, model=2), tp=True)
    assert loss_tp == pytest.approx(loss_dp, rel=1e-4)

    # the fc1 kernel really lives as half-width shards over the model axis
    fc1 = new_state.params["text_model"]["layer00"]["ffn_lin1"]["kernel"]
    assert fc1.sharding.spec == P(None, MODEL_AXIS)
    shard_shapes = {s.data.shape for s in fc1.addressable_shards}
    assert shard_shapes == {(24, 24)}  # 48 cols / 2-way model axis

    # updated params keep their sharding (optimizer moments mirrored);
    # fc2 [96, 24] row-shards to (48, 24) halves over the model axis
    fc2 = new_state.params["video_model"]["block00"]["mlp"]["fc2"]["kernel"]
    assert {s.data.shape for s in fc2.addressable_shards} == {(48, 24)}


def test_sequence_parallel_matches_data_parallel(rng):
    """Ulysses-style context parallelism (core/sp.py): sharding the video
    token grid over the model axis — patch columns during time attention,
    frames during space attention, one all-to-all between phases —
    reproduces the pure-DP EgoNCE train-step loss."""
    from egovlp_tpu.core.mesh import replicated, shard_batch
    from egovlp_tpu.models import (
        DualEncoder,
        DualEncoderConfig,
        TextTowerConfig,
        VideoTowerConfig,
    )
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    res = 32  # 2x2 patch grid, 4 frames: both grid axes divide the 2-way axis

    def run(mesh_spec, sp):
        cfg = DualEncoderConfig(
            video=VideoTowerConfig(img_size=res, patch_size=16, embed_dim=24,
                                   depth=2, num_heads=2, num_frames=4,
                                   attention_impl="xla",
                                   sequence_parallel=("model" if sp else None)),
            text=TextTowerConfig(vocab_size=64, dim=24, n_layers=2, n_heads=2,
                                 hidden_dim=48, max_position_embeddings=16),
            projection_dim=8,
        )
        model = DualEncoder(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, res, res, 3), jnp.float32),
                            jnp.zeros((1, 8), jnp.int32),
                            jnp.ones((1, 8), jnp.int32))["params"]
        tx = make_optimizer(1e-4, (60,), 10)
        mesh = create_mesh(mesh_spec)
        step = make_egoclip_train_step(loss_type="EgoNCE", input_res=res)
        state = create_train_state(model, params, tx)
        state = jax.device_put(state, replicated(mesh))
        batch = shard_batch(host_batch, mesh)
        with mesh:
            _, loss = step(state, batch, jax.random.PRNGKey(0))
        return float(loss)

    B = 16
    host_batch = {
        "frames": rng.integers(0, 255, (B, 4, res, res * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, 64, (B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
    }

    loss_dp = run(MeshSpec(), sp=False)                  # 8 x 1
    loss_sp = run(MeshSpec(data=4, model=2), sp=True)    # tokens over model
    assert loss_sp == pytest.approx(loss_dp, rel=1e-4)
