"""Model tower shape / invariant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.models import (
    DistilBert,
    DualEncoder,
    DualEncoderConfig,
    SpaceTimeTransformer,
    TextTowerConfig,
    VideoTowerConfig,
    sim_matrix,
)

TINY_VIDEO = VideoTowerConfig(
    img_size=32, patch_size=16, embed_dim=24, depth=2, num_heads=2,
    num_frames=4,
)
TINY_TEXT = TextTowerConfig(
    vocab_size=128, dim=24, n_layers=2, n_heads=2, hidden_dim=48,
    max_position_embeddings=32,
)


def test_video_tower_shapes(rng):
    model = SpaceTimeTransformer(TINY_VIDEO)
    video = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(params, video)
    assert out.shape == (2, TINY_VIDEO.embed_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_video_tower_variable_frames(rng):
    """T <= num_frames supported by slicing the positional table
    (reference video_transformer.py:319-320)."""
    model = SpaceTimeTransformer(TINY_VIDEO)
    v4 = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), v4)
    v2 = v4[:, :2]
    out = model.apply(params, v2)
    assert out.shape == (1, TINY_VIDEO.embed_dim)


def test_zero_time_init_single_frame_equals_vit_path(rng):
    """With time_init='zeros' the time-attention branch contributes exactly 0,
    so the tower output must be invariant to the time-attention weights."""
    model = SpaceTimeTransformer(TINY_VIDEO)
    video = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)
    out1 = model.apply(params, video)

    # perturb only the time-attention *qkv bias is zero*: since qkv weights
    # are zero, q=k=v=0 and output == proj_bias == 0 regardless of proj kernel.
    p = jax.tree_util.tree_map(lambda x: x, params)
    flat = jax.tree_util.tree_flatten_with_path(p)[0]
    # scale every timeattn proj kernel by 7 — must not change anything
    def mutate(path, x):
        keys = "/".join(str(k) for k in path)
        if "timeattn" in keys and "proj" in keys and "kernel" in keys:
            return x * 7.0
        return x
    p = jax.tree_util.tree_map_with_path(mutate, p)
    out2 = model.apply(p, video)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_text_tower_shapes_and_mask(rng):
    model = DistilBert(TINY_TEXT)
    ids = jnp.asarray(rng.integers(0, 128, size=(3, 16)), jnp.int32)
    mask = jnp.ones((3, 16), jnp.int32).at[:, 10:].set(0)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (3, 16, TINY_TEXT.dim)

    # padded token content must not affect unmasked positions
    ids2 = ids.at[:, 10:].set(77)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out[:, :10]), np.asarray(out2[:, :10]), atol=1e-5
    )


def test_dual_encoder_end_to_end(rng):
    cfg = DualEncoderConfig(video=TINY_VIDEO, text=TINY_TEXT, projection_dim=8)
    model = DualEncoder(cfg)
    video = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask)
    t, v = model.apply(params, video, ids, mask)
    assert t.shape == (2, 8) and v.shape == (2, 8)
    sims = sim_matrix(t, v)
    assert sims.shape == (2, 2)
    assert np.all(np.abs(np.asarray(sims)) <= 1.0 + 1e-5)


def test_dual_encoder_task_head_dims(rng):
    """projection_dim doubles as OSCC (2) / PNR (16) head width."""
    for dim in (2, 16):
        cfg = DualEncoderConfig(video=TINY_VIDEO, text=TINY_TEXT,
                                projection_dim=dim)
        model = DualEncoder(cfg)
        video = jnp.asarray(np.zeros((1, 4, 32, 32, 3)), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), video,
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        )
        out = model.apply(params, video, method="encode_video")
        assert out.shape == (1, dim)


def test_sim_matrix_matches_cosine(rng):
    a = rng.normal(size=(4, 6)).astype(np.float32)
    b = rng.normal(size=(5, 6)).astype(np.float32)
    want = (a / np.linalg.norm(a, axis=1, keepdims=True)) @ (
        b / np.linalg.norm(b, axis=1, keepdims=True)
    ).T
    got = np.asarray(sim_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_remat_matches_plain(rng):
    """remat=True must be numerically identical (it only changes the
    backward-pass memory schedule)."""
    import dataclasses

    cfg_r = dataclasses.replace(TINY_VIDEO, remat=True)
    video = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    m0 = SpaceTimeTransformer(TINY_VIDEO)
    params = m0.init(jax.random.PRNGKey(0), video)
    out0 = m0.apply(params, video)
    out1 = SpaceTimeTransformer(cfg_r).apply(params, video)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)

    g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, video) ** 2))(params)
    g1 = jax.grad(
        lambda p: jnp.sum(SpaceTimeTransformer(cfg_r).apply(p, video) ** 2)
    )(params)
    a = jax.tree_util.tree_leaves(g0)
    b = jax.tree_util.tree_leaves(g1)
    for x, y in zip(a, b):
        # recompute reorders f32 reductions; allow tiny drift
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=2e-4)


def test_remat_variants_match(rng):
    """Selective remat ('mlp'/'attn') and block remat must not change
    fwd/bwd numerics or the param tree (the converter contract)."""
    import jax
    import jax.numpy as jnp

    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    video = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    ref_loss = ref_tree = None
    for rm in (False, "block", "mlp", "attn", "attn_out"):
        cfg = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24,
                               depth=2, num_heads=2, num_frames=4, remat=rm,
                               attention_impl="xla")
        m = SpaceTimeTransformer(cfg)
        p = m.init(jax.random.PRNGKey(0), video)
        tree = jax.tree_util.tree_structure(p)
        loss = float(jnp.sum(m.apply(p, video) ** 2))
        g = jax.grad(lambda p: jnp.sum(m.apply(p, video) ** 2))(p)
        gsum = float(sum(jnp.sum(jnp.abs(l))
                         for l in jax.tree_util.tree_leaves(g)))
        if ref_loss is None:
            ref_loss, ref_tree, ref_gsum = loss, tree, gsum
        else:
            assert tree == ref_tree, rm
            assert loss == pytest.approx(ref_loss, rel=1e-5), rm
            assert gsum == pytest.approx(ref_gsum, rel=1e-3), rm


def test_resolve_attention_impls_policy():
    """'auto' on TPU = both kernels fused at EVERY frame count (since the
    r4 MXU-segmented time bodies the fused kernel wins the full-tower A/B
    at 16f too, scripts/attn16_ab.py); 'mixed' keeps the r3 space-fused +
    time-XLA path as an escape hatch.  CPU always resolves to XLA."""
    from egovlp_tpu.models.video_tower import resolve_attention_impls

    assert resolve_attention_impls("auto", 4, "tpu") == ("pallas", "pallas")
    assert resolve_attention_impls("auto", 8, "tpu") == ("pallas", "pallas")
    assert resolve_attention_impls("auto", 16, "tpu") == ("pallas", "pallas")
    assert resolve_attention_impls("auto", 32, "tpu") == ("pallas", "pallas")
    assert resolve_attention_impls("auto", 4, "cpu") == ("xla", "xla")
    assert resolve_attention_impls("auto", 16, "cpu") == ("xla", "xla")
    assert resolve_attention_impls("mixed", 4, "tpu") == ("pallas", "xla")
    assert resolve_attention_impls("mixed", 4, "cpu") == ("xla", "xla")
    assert resolve_attention_impls("mixed2", 4, "tpu") == ("pallas", "xla2")
    for forced in ("xla", "pallas"):
        assert resolve_attention_impls(forced, 16, "tpu") == (forced, forced)
    # default backend arg resolves (cpu in the test env)
    assert resolve_attention_impls("auto", 4) == ("xla", "xla")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_layer_norm_matches_flax(rng, dtype):
    """FusedLayerNorm (memory-lean VJP, kernels/fused_ln.py) reproduces
    nn.LayerNorm values AND input/param gradients."""
    from flax import linen as nn

    from egovlp_tpu.kernels.fused_ln import FusedLayerNorm

    x = jnp.asarray(rng.normal(size=(3, 7, 24)).astype(np.float32), dtype)
    ref = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    fused = FusedLayerNorm(epsilon=1e-6, dtype=dtype)
    params = ref.init(jax.random.PRNGKey(0), x)
    # perturb scale/bias so gradients are non-trivial
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jnp.arange(p.size, dtype=p.dtype), params)
    assert jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), x)) == \
        jax.tree_util.tree_structure(params)

    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    got = fused.apply(params, x)
    want = ref.apply(params, x)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)

    def loss(mod):
        def f(params, x):
            return jnp.sum(jnp.sin(mod.apply(params, x).astype(jnp.float32)))
        return f

    g_got = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    g_want = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_want)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5 * tol, atol=5 * tol)
