"""Pallas fused grouped attention vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.kernels.divided_attention import divided_attention
from egovlp_tpu.kernels.pallas_attention import grouped_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("axis", ["space", "time"])
def test_pallas_matches_xla_forward(rng, axis):
    B, H, f, n, hd = 2, 2, 3, 8, 16
    S = 1 + f * n
    q, k, v = (_rand(rng, B, H, S, hd) for _ in range(3))
    want = divided_attention(q, k, v, frames=f, patches=n, axis=axis,
                             impl="xla")
    got = divided_attention(q, k, v, frames=f, patches=n, axis=axis,
                            impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_gradients_match_xla(rng):
    B, H, f, n, hd = 1, 2, 2, 8, 16
    S = 1 + f * n
    q, k, v = (_rand(rng, B, H, S, hd) for _ in range(3))

    def loss(impl):
        def fn(q, k, v):
            out = divided_attention(q, k, v, frames=f, patches=n,
                                    axis="space", impl=impl)
            return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

        return fn

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name} mismatch")


def test_grouped_attention_direct(rng):
    """Direct kernel call vs dense math."""
    BH, G, L, hd = 3, 2, 8, 16
    q = _rand(rng, BH, G, L, hd)
    k = _rand(rng, BH, G, L, hd)
    v = _rand(rng, BH, G, L, hd)
    ck = _rand(rng, BH, 1, hd)
    cv = _rand(rng, BH, 1, hd)
    got = grouped_attention(q, k, v, ck, cv)

    logits = jnp.einsum("bgqd,bgkd->bgqk", q, k)
    cls_col = jnp.einsum("bgqd,bkd->bgqk", q, ck)
    full = jax.nn.softmax(jnp.concatenate([cls_col, logits], -1), -1)
    want = jnp.einsum("bgqk,bgkd->bgqd", full[..., 1:], v) + \
        full[..., :1] * cv[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_video_tower_pallas_impl_matches_xla(rng):
    from egovlp_tpu.models import SpaceTimeTransformer, VideoTowerConfig

    cfg_x = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24,
                             depth=2, num_heads=2, num_frames=4,
                             attention_impl="xla")
    cfg_p = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24,
                             depth=2, num_heads=2, num_frames=4,
                             attention_impl="pallas")
    video = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    mx = SpaceTimeTransformer(cfg_x)
    params = mx.init(jax.random.PRNGKey(0), video)
    out_x = mx.apply(params, video)
    out_p = SpaceTimeTransformer(cfg_p).apply(params, video)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


def test_time_attention_gradients_match_xla(rng):
    """The transpose-free time kernel (fwd + bwd) vs the XLA path."""
    B, H, f, n, hd = 1, 2, 4, 8, 16
    S = 1 + f * n
    q, k, v = (_rand(rng, B, H, S, hd) for _ in range(3))

    def loss(impl):
        def fn(q, k, v):
            out = divided_attention(q, k, v, frames=f, patches=n,
                                    axis="time", impl=impl)
            return jnp.sum(out * jnp.cos(out))

        return fn

    np.testing.assert_allclose(
        float(loss("pallas")(q, k, v)), float(loss("xla")(q, k, v)),
        rtol=1e-5,
    )
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name} mismatch")


def test_bsd_matches_head_split(rng):
    """The [B, S, D] lane-sliced kernels (fwd + grad) vs the head-split XLA
    path, both axes."""
    from egovlp_tpu.kernels.divided_attention import divided_attention_bsd

    B, H, f, n, hd = 2, 2, 3, 8, 16
    D = H * hd
    S = 1 + f * n
    q, k, v = (_rand(rng, B, S, D) for _ in range(3))

    for axis in ("space", "time"):
        want = divided_attention_bsd(q, k, v, heads=H, frames=f, patches=n,
                                     axis=axis, impl="xla")
        got = divided_attention_bsd(q, k, v, heads=H, frames=f, patches=n,
                                    axis=axis, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5, err_msg=axis)

        def loss(impl):
            def fn(q, k, v):
                out = divided_attention_bsd(q, k, v, heads=H, frames=f,
                                            patches=n, axis=axis, impl=impl)
                return jnp.sum(out * jnp.cos(out))

            return fn

        gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gp, gx, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                err_msg=f"{axis} d{name}",
            )


def test_time_n_block_arithmetic():
    from egovlp_tpu.kernels.pallas_attention import time_n_block

    # small shapes: single block
    assert time_n_block(4, 196, 128) == 196
    # 16-frame shape must block: the 11 double-buffered ref blocks alone
    # would need ~17.6 MB at full n
    nb = time_n_block(16, 196, 128)
    assert nb < 196 and nb % 8 == 0
    assert 11 * 16 * nb * 128 * 2 * 2 <= 12 * 2 ** 20


def test_time_blocked_n_matches_xla(rng, monkeypatch):
    """Force n-blocking (+ padding) on a tiny shape and check fwd + grads
    against the XLA path."""
    import importlib

    import egovlp_tpu.kernels.pallas_attention as pa

    da = importlib.import_module("egovlp_tpu.kernels.divided_attention")

    monkeypatch.setattr(pa, "time_n_block", lambda f, n, lb, **kw: 8)
    da._time_bsd.cache_clear()

    B, H, f, n, hd = 1, 2, 3, 12, 16  # n=12 pads to 16, blocks of 8
    D = H * hd
    S = 1 + f * n
    q, k, v = (_rand(rng, B, S, D) for _ in range(3))

    want = da.divided_attention_bsd(q, k, v, heads=H, frames=f, patches=n,
                                    axis="time", impl="xla")
    got = da.divided_attention_bsd(q, k, v, heads=H, frames=f, patches=n,
                                   axis="time", impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    def loss(impl):
        def fn(q, k, v):
            out = da.divided_attention_bsd(q, k, v, heads=H, frames=f,
                                           patches=n, axis="time", impl=impl)
            return jnp.sum(out * jnp.cos(out))

        return fn

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"d{name}")
    da._time_bsd.cache_clear()


def test_time_n_block_probe_shrinks_on_vmem_failure(monkeypatch, tmp_path):
    """Portability: when the compile probe reports scoped-VMEM failure, the
    block size halves (multiples of 8) until a candidate fits, and the
    result is cached on disk keyed by device kind + jax version."""
    import egovlp_tpu.kernels.pallas_attention as pa

    monkeypatch.setenv("EGOVLP_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pa, "_NB_CACHE", {})
    monkeypatch.setattr(pa, "_use_interpret", lambda: False)  # pretend TPU
    probed = []

    def fake_probe(f, nb, lb, hd, multi_j=True, dtype=None):
        probed.append(nb)
        return nb <= 16  # pretend only nb<=16 fits this "generation"

    monkeypatch.setattr(pa, "_time_kernel_compiles", fake_probe)

    nb = pa.time_n_block(4, 196, 128, hd=64)
    assert nb == 16  # largest fitting multiple of 8, found by search
    assert probed[0] == 196  # analytic prior for f=4 says full n

    # second query: in-process cache, no new probes
    before = len(probed)
    assert pa.time_n_block(4, 196, 128, hd=64) == 16
    assert len(probed) == before

    # padded re-query from the kernel agrees without probing
    n_pad = -(-196 // nb) * nb
    assert pa.time_n_block(4, n_pad, 128, hd=64) == 16
    assert len(probed) == before

    # fresh process (cleared in-proc cache): disk cache answers
    monkeypatch.setattr(pa, "_NB_CACHE", {})
    assert pa.time_n_block(4, 196, 128, hd=64) == 16
    assert len(probed) == before


def test_time_n_block_env_override(monkeypatch):
    import egovlp_tpu.kernels.pallas_attention as pa

    monkeypatch.setenv("EGOVLP_TIME_NB", "24")
    assert pa.time_n_block(16, 196, 128) == 24


def test_time_n_block_raises_when_nothing_fits(monkeypatch, tmp_path):
    import egovlp_tpu.kernels.pallas_attention as pa

    monkeypatch.setenv("EGOVLP_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pa, "_NB_CACHE", {})
    monkeypatch.setattr(pa, "_use_interpret", lambda: False)
    monkeypatch.setattr(pa, "_time_kernel_compiles",
                        lambda *a, **k: False)
    with pytest.raises(RuntimeError, match="attention_impl='xla'"):
        pa.time_n_block(16, 196, 128, hd=64)


def test_time_n_block_probe_grows_when_prior_fits(monkeypatch, tmp_path):
    """When the analytic prior compiles first try, the probe grows the
    block (doubling, then binary search) to the largest fitting size."""
    import egovlp_tpu.kernels.pallas_attention as pa

    monkeypatch.setenv("EGOVLP_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pa, "_NB_CACHE", {})
    monkeypatch.setattr(pa, "_use_interpret", lambda: False)
    monkeypatch.setattr(pa, "_time_kernel_compiles",
                        lambda f, nb, lb, hd, multi_j=True, dtype=None:
                        nb <= 64)

    # f=16 analytic prior is 8; 8->16->32->64 fit, 128 fails, search -> 64;
    # pad-balancing keeps the same 4 blocks but shrinks to 56
    # (4*56 = 224 pad vs 4*64 = 256)
    assert pa.time_n_block(16, 196, 128, hd=64) == 56


def test_time_bsd_batched_body_matches_xla(rng):
    """f >= 8 routes the time kernels through the fi-BATCHED bodies (one
    [f*nb, hd] tile per head, sublane-reduced dk/dv); check fwd + all grads
    against the XLA path in interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from egovlp_tpu.kernels.divided_attention import divided_attention_bsd

    B, H, f, n, hd = 1, 2, 8, 12, 16
    D, S = H * hd, 1 + 8 * 12
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
               for _ in range(3))

    def loss(impl):
        def fn(q, k, v):
            out = divided_attention_bsd(q, k, v, heads=H, frames=f,
                                        patches=n, axis="time", impl=impl)
            return jnp.sum(out ** 2)

        return fn

    vp, gp = jax.value_and_grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    vx, gx = jax.value_and_grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_time_bsd_batched_body_blocked_n_matches_xla(rng, monkeypatch):
    """ADVICE r2: the fi-BATCHED (f>=8) backward with MULTIPLE n-blocks —
    per-j dck/dcv block writes plus padded tail rows — exercised
    numerically in interpret mode (nb forced to 8 so n=12 pads to 16)."""
    import importlib

    import egovlp_tpu.kernels.pallas_attention as pa

    da = importlib.import_module("egovlp_tpu.kernels.divided_attention")
    monkeypatch.setattr(pa, "time_n_block", lambda f, n, lb, **kw: 8)
    da._time_bsd.cache_clear()
    pa._time_bsd_ops.cache_clear()

    B, H, f, n, hd = 1, 2, 8, 12, 16
    D, S = H * hd, 1 + f * n
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
               for _ in range(3))

    def loss(impl):
        def fn(q, k, v):
            out = da.divided_attention_bsd(q, k, v, heads=H, frames=f,
                                           patches=n, axis="time", impl=impl)
            return jnp.sum(out ** 2)

        return fn

    vp, gp = jax.value_and_grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    vx, gx = jax.value_and_grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    da._time_bsd.cache_clear()
    pa._time_bsd_ops.cache_clear()


def test_bsd_kernel_head_sharding_partition_rule(rng):
    """Direct check of the custom_partitioning d-axis rule: with the minor
    dim sharded head-aligned over a mesh axis, the space kernel computes
    each head's attention locally and matches the unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from egovlp_tpu.kernels.pallas_attention import make_space_attention_bsd

    H, hd, G, L, B = 2, 16, 3, 8, 4
    D = H * hd
    fn = make_space_attention_bsd(H, float(hd) ** -0.5)
    q, k, v = (_rand(rng, B, G, L, D) for _ in range(3))
    ck, cv = (_rand(rng, B, 1, D) for _ in range(2))
    want = fn(q, k, v, ck, cv)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    blk = NamedSharding(mesh, P(None, None, None, "model"))
    cls = NamedSharding(mesh, P(None, None, "model"))
    qs, ks, vs = (jax.device_put(t, blk) for t in (q, k, v))
    cks, cvs = (jax.device_put(t, cls) for t in (ck, cv))
    with mesh:
        got = jax.jit(fn)(qs, ks, vs, cks, cvs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_bsd_kernel_invalid_d_sharding_falls_back_to_replication(rng):
    """When the proposed minor-dim sharding would break head alignment
    (local D < head width), the partition callback replicates d instead —
    the op still computes correctly (the partitioner inserts the gather)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from egovlp_tpu.kernels.pallas_attention import make_space_attention_bsd

    H, hd, G, L, B = 2, 16, 3, 8, 4
    D = H * hd  # 32; sharded 4-way -> local 8 < hd=16: invalid
    fn = make_space_attention_bsd(H, float(hd) ** -0.5)
    q, k, v = (_rand(rng, B, G, L, D) for _ in range(3))
    ck, cv = (_rand(rng, B, 1, D) for _ in range(2))
    want = fn(q, k, v, ck, cv)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    blk = NamedSharding(mesh, P(None, None, None, "model"))
    cls = NamedSharding(mesh, P(None, None, "model"))
    qs, ks, vs = (jax.device_put(t, blk) for t in (q, k, v))
    cks, cvs = (jax.device_put(t, cls) for t in (ck, cv))
    with mesh:
        got = jax.jit(fn)(qs, ks, vs, cks, cvs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("B,H,f,n,hd", [
    (1, 1, 2, 4, 8),     # minimal everything
    (2, 4, 5, 7, 16),    # odd f and n (n pads to the probed block)
    (1, 2, 3, 13, 32),   # prime n, wider head
    (3, 2, 8, 9, 16),    # fi-batched body (f>=8) with tiny odd n
    (1, 8, 4, 16, 16),   # D = 128 exactly one lane block
])
def test_bsd_kernels_shape_sweep(rng, B, H, f, n, hd):
    """Shape-robustness sweep: fwd + grads of both BSD kernels vs the XLA
    path across small awkward shapes (odd groups, prime columns, lane-block
    boundaries) in interpret mode."""
    from egovlp_tpu.kernels.divided_attention import divided_attention_bsd

    D, S = H * hd, 1 + f * n
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
               for _ in range(3))
    for axis in ("space", "time"):
        def loss(impl):
            def fn(q, k, v):
                out = divided_attention_bsd(q, k, v, heads=H, frames=f,
                                            patches=n, axis=axis, impl=impl)
                return jnp.sum(out ** 2)

            return fn

        vp, gp = jax.value_and_grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
        vx, gx = jax.value_and_grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5,
                                   err_msg=f"{axis} fwd")
        for a, b, nm in zip(gp, gx, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-5,
                                       err_msg=f"{axis} d{nm}")


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
@pytest.mark.parametrize("f", [4, 16])
def test_time_kernel_variants_match(rng, monkeypatch, variant, f):
    """All time-kernel bodies — v1 (fi-batched VPU lane reductions),
    v2 (MXU-segmented) and v3 (v2 with the per-frame matmuls batched into
    one MXU pass) — produce the same forward values and input gradients.
    The variant is consulted at trace time (EGOVLP_TIME_KERNEL)."""
    import egovlp_tpu.kernels.pallas_attention as pa

    monkeypatch.setenv("EGOVLP_TIME_KERNEL", variant)
    B, H, D, n = 2, 4, 256, 20
    hd = D // H
    scale = hd ** -0.5
    q, k, v, do = (jnp.asarray(rng.normal(size=(B, f, n, D)),
                               jnp.float32) for _ in range(4))
    ck, cv = (jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
              for _ in range(2))

    out = pa._time_fwd_bsd_call(q, k, v, ck, cv, hd=hd, scale=scale)
    grads = pa._time_bwd_bsd_call(q, k, v, ck, cv, do, hd=hd, scale=scale)

    # XLA oracle via the pair-layout time path
    from egovlp_tpu.kernels.divided_attention import _time_xla_parts

    qc = jnp.zeros((B, 1, D), jnp.float32)
    # patch-token rows only: feed a zero CLS query (its row is ignored)
    _, want = _time_xla_parts(qc, ck, cv, q, k, v, heads=H,
                              frames=f, patches=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    def loss(q, k, v, ck, cv):
        _, op = _time_xla_parts(qc, ck, cv, q, k, v, heads=H,
                                frames=f, patches=n)
        return jnp.sum(op * do)

    want_g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, ck, cv)
    for a, b, nm in zip(grads, want_g, ["dq", "dk", "dv", "dck", "dcv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b).reshape(
            np.asarray(a).shape), rtol=3e-4, atol=3e-5, err_msg=nm)


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
def test_space_kernel_variants_match(rng, monkeypatch, variant):
    """All space-kernel bodies — v1 (divide-then-matmul softmax, f32
    backward matmuls), v2 (exp2 softmax, deferred normalisation,
    input-dtype backward matmuls), and v3 (head-packed dense matmuls over
    block-stacked lane-masked k/v) — produce the same forward values and
    input gradients.  The variant is consulted at trace time
    (EGOVLP_SPACE_KERNEL)."""
    import egovlp_tpu.kernels.pallas_attention as pa
    from egovlp_tpu.kernels.divided_attention import divided_attention_parts

    monkeypatch.setenv("EGOVLP_SPACE_KERNEL", variant)
    B, H, D, f, n = 2, 4, 256, 3, 20
    hd = D // H
    scale = hd ** -0.5
    q, k, v, do = (jnp.asarray(rng.normal(size=(B, f, n, D)), jnp.float32)
                   for _ in range(4))
    ck, cv = (jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
              for _ in range(2))

    fn = pa.make_space_attention_bsd(H, scale)
    out, vjp = jax.vjp(fn, q, k, v, ck, cv)
    grads = vjp(do)

    # XLA oracle on the grid layout: loss only on the patch rows, so the
    # (zero-query) CLS row contributes nothing to the compared gradients
    qc = jnp.zeros((B, 1, D), jnp.float32)

    def oracle(q, k, v, ck, cv):
        _, op = divided_attention_parts(qc, ck, cv, q, k, v, heads=H,
                                        frames=f, patches=n, axis="space",
                                        impl="xla")
        return op

    want = oracle(q, k, v, ck, cv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    def loss(q, k, v, ck, cv):
        return jnp.sum(oracle(q, k, v, ck, cv) * do)

    want_g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, ck, cv)
    for a, b, nm in zip(grads, want_g, ["dq", "dk", "dv", "dck", "dcv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b).reshape(
            np.asarray(a).shape), rtol=3e-4, atol=3e-5, err_msg=nm)


def test_space_kernel_v3_per_head_max_stability(rng, monkeypatch):
    """The head-packed v3 softmax must take its row max PER HEAD: with a
    shared max across the hpb packed heads, a head whose max logit sits
    more than ~126 log2 units below its block-mate's underflows its whole
    exp2 row to zero (rs == 0 -> 1/rs == inf -> NaN outputs and grads).
    One head's queries are scaled so the packed maxima diverge by ~900
    log2 units; v3 must stay finite and match the XLA oracle."""
    import egovlp_tpu.kernels.pallas_attention as pa
    from egovlp_tpu.kernels.divided_attention import divided_attention_parts

    monkeypatch.setenv("EGOVLP_SPACE_KERNEL", "v3")
    B, H, D, f, n = 1, 4, 256, 2, 12
    hd = D // H
    scale = hd ** -0.5
    q, k, v, do = (jnp.asarray(rng.normal(size=(B, f, n, D)), jnp.float32)
                   for _ in range(4))
    ck, cv = (jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
              for _ in range(2))
    # blow up head 0 of every 128-lane block (heads 0 and 2 at hd=64):
    # its packed block-mate (head 1 / 3) keeps O(1) logits
    amp = np.ones((D,), np.float32)
    amp[0 * hd:1 * hd] = 200.0
    amp[2 * hd:3 * hd] = 200.0
    q = q * jnp.asarray(amp)

    fn = pa.make_space_attention_bsd(H, scale)
    out, vjp = jax.vjp(fn, q, k, v, ck, cv)
    grads = vjp(do)
    assert np.isfinite(np.asarray(out)).all()
    for g, nm in zip(grads, ["dq", "dk", "dv", "dck", "dcv"]):
        assert np.isfinite(np.asarray(g)).all(), nm

    qc = jnp.zeros((B, 1, D), jnp.float32)
    _, want = divided_attention_parts(qc, ck, cv, q, k, v, heads=H,
                                      frames=f, patches=n, axis="space",
                                      impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
