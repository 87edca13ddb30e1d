"""Divided space-time attention vs. a naive per-group reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.kernels.divided_attention import divided_attention


def naive_divided_attention(q, k, v, frames, patches, axis):
    """Direct loop implementation of the CLS-splice semantics."""
    B, H, S, hd = q.shape
    out = np.zeros_like(q)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    for b in range(B):
        for h in range(H):
            qq, kk, vv = q[b, h], k[b, h], v[b, h]
            # CLS attends over everything
            p = softmax(qq[0:1] @ kk.T)
            out[b, h, 0] = (p @ vv)[0]
            pk = kk[1:].reshape(frames, patches, hd)
            pv = vv[1:].reshape(frames, patches, hd)
            pq = qq[1:].reshape(frames, patches, hd)
            if axis == "time":
                pq, pk, pv = (t.transpose(1, 0, 2) for t in (pq, pk, pv))
            G, L, _ = pq.shape
            og = np.zeros((G, L, hd), q.dtype)
            for g in range(G):
                kg = np.concatenate([kk[0:1], pk[g]], 0)
                vg = np.concatenate([vv[0:1], pv[g]], 0)
                og[g] = softmax(pq[g] @ kg.T) @ vg
            if axis == "time":
                og = og.transpose(1, 0, 2)
            out[b, h, 1:] = og.reshape(frames * patches, hd)
    return out


@pytest.mark.parametrize("axis", ["space", "time"])
def test_matches_naive(rng, axis):
    B, H, f, n, hd = 2, 3, 4, 5, 8
    S = 1 + f * n
    q = rng.normal(size=(B, H, S, hd)).astype(np.float32)
    k = rng.normal(size=(B, H, S, hd)).astype(np.float32)
    v = rng.normal(size=(B, H, S, hd)).astype(np.float32)

    got = divided_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        frames=f, patches=n, axis=axis,
    )
    want = naive_divided_attention(q, k, v, f, n, axis)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["xla", "xla2"])
@pytest.mark.parametrize("f,n", [(4, 5), (16, 7)])
def test_time_xla_parts_matches_generic(rng, f, n, impl):
    """The native pair-layout XLA time paths (_time_xla_parts and the
    canonical-relayout _time_xla_parts_v2 — the 16f production path)
    match the concat+head-split formulation, values and gradients."""
    from egovlp_tpu.kernels.divided_attention import (
        divided_attention_bsd, divided_attention_parts)

    B, H, hd = 2, 3, 8
    D = H * hd
    Sp = f * n
    parts = [jnp.asarray(rng.normal(size=(B, 1, D)).astype(np.float32))
             for _ in range(3)]
    patches = [jnp.asarray(rng.normal(size=(B, Sp, D)).astype(np.float32))
               for _ in range(3)]

    def run_parts(qc, kc, vc, qp, kp, vp):
        oc, op = divided_attention_parts(qc, kc, vc, qp, kp, vp, heads=H,
                                         frames=f, patches=n, axis="time",
                                         impl=impl)
        return jnp.concatenate([oc, op], axis=1)

    def run_generic(qc, kc, vc, qp, kp, vp):
        q = jnp.concatenate([qc, qp], axis=1)
        k = jnp.concatenate([kc, kp], axis=1)
        v = jnp.concatenate([vc, vp], axis=1)
        return divided_attention_bsd(q, k, v, heads=H, frames=f, patches=n,
                                     axis="time", impl="xla")

    got = run_parts(*parts, *patches)
    want = run_generic(*parts, *patches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    loss = lambda fn: lambda *a: jnp.sum(jnp.sin(fn(*a)))
    g_got = jax.grad(loss(run_parts), argnums=(0, 3))(*parts, *patches)
    g_want = jax.grad(loss(run_generic), argnums=(0, 3))(*parts, *patches)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_single_frame_space_equals_full_attention(rng):
    """With one frame, space attention == vanilla full attention."""
    B, H, n, hd = 1, 2, 6, 4
    S = 1 + n
    q = rng.normal(size=(B, H, S, hd)).astype(np.float32)
    k = rng.normal(size=(B, H, S, hd)).astype(np.float32)
    v = rng.normal(size=(B, H, S, hd)).astype(np.float32)

    got = divided_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        frames=1, patches=n, axis="space",
    )
    logits = jnp.einsum("bhqd,bhkd->bhqk", jnp.asarray(q), jnp.asarray(k))
    want = jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), jnp.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("axis", ["space", "time"])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_parts_grid_layout_matches_flat(rng, axis, impl):
    """divided_attention_parts accepts the tower's native [B, f, n, D]
    grid layout and returns it; values (fwd AND input grads) match the
    flat [B, f*n, D] call exactly — the dual-rank API contract the
    grid-layout tower relies on."""
    from egovlp_tpu.kernels.divided_attention import divided_attention_parts

    B, H, f, n, hd = 2, 2, 3, 8, 8
    D, Sp = H * hd, 3 * 8
    qc, kc, vc = (jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
                  for _ in range(3))
    flat = [jnp.asarray(rng.normal(size=(B, Sp, D)), jnp.float32)
            for _ in range(3)]
    grid = [t.reshape(B, f, n, D) for t in flat]

    def run(parts, shape_back):
        def loss(*p):
            oc, op = divided_attention_parts(
                qc, kc, vc, *p, heads=H, frames=f, patches=n,
                axis=axis, impl=impl)
            assert op.shape == p[0].shape  # rank-preserving
            return jnp.sum(oc ** 2) + jnp.sum(jnp.sin(op)), (oc, op)

        (val, (oc, op)), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(*parts)
        return (float(val), np.asarray(oc),
                np.asarray(op).reshape(B, Sp, D),
                [np.asarray(g).reshape(B, Sp, D) for g in grads])

    v_f, oc_f, op_f, g_f = run(flat, False)
    v_g, oc_g, op_g, g_g = run(grid, True)
    assert v_g == pytest.approx(v_f, rel=1e-6)
    np.testing.assert_array_equal(oc_g, oc_f)
    np.testing.assert_array_equal(op_g, op_f)
    for a, b in zip(g_g, g_f):
        np.testing.assert_array_equal(a, b)
