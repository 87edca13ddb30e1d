"""Divided space-time attention with CLS splice.

Semantics (matching the reference `VarAttention`,
/root/reference/model/video_transformer.py:80-137):

  * the sequence is ``[CLS, patch(frame0), patch(frame1), ...]`` of length
    ``1 + frames * patches``;
  * the CLS query attends over *all* keys/values (full attention row);
  * patch queries are grouped along one axis — ``space``: the ``patches``
    tokens of one frame; ``time``: the ``frames`` tokens of one patch
    column — and attend within their group **plus** the CLS key/value
    spliced in front.

Performance notes (measured on TPU v5e at the EgoVLP pretraining shape,
B=32 H=12 f=4 n=196 hd=64):

  * the CLS key/value are concatenated into the grouped k/v BEFORE the
    logits matmul (a [L+1]-key copy, ~40 MB) rather than concatenating the
    [L, L] logit blocks after (a ~240 MB f32 concat) — this plus flat
    3-D batched matmul shapes takes the op from ~5 ms to ~0.15 ms;
  * probabilities are computed in float32 and cast to the input dtype for
    the second matmul, which XLA fuses into the matmul epilogue;
  * ``impl='pallas'`` routes the grouped part through the fused VMEM
    kernel (kernels/pallas_attention.py) which never materializes the
    probabilities in HBM.

This module is the single source of truth for the op; the Flax towers call
``divided_attention``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def divided_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    frames: int,
    patches: int,
    axis: str,
    impl: str = "xla",
) -> jax.Array:
    """Compute divided space-time attention.

    Args:
      q, k, v: ``[B, H, S, hd]`` with ``S = 1 + frames * patches``.  ``q`` is
        expected pre-scaled by ``hd ** -0.5`` (the reference scales q only,
        video_transformer.py:106).
      frames: number of frames f.
      patches: patches per frame n.
      axis: ``"space"`` (group = frame, length = patches) or ``"time"``
        (group = patch column, length = frames).
      impl: ``"xla"`` or ``"pallas"``.

    Returns:
      ``[B, H, S, hd]`` attention output (pre output-projection).
    """
    if axis not in ("space", "time"):
        raise ValueError(f"axis must be 'space' or 'time', got {axis!r}")
    B, H, S, hd = q.shape
    assert S == 1 + frames * patches, (S, frames, patches)
    dtype = q.dtype

    cls_k = k[:, :, :1]
    cls_v = v[:, :, :1]

    # --- CLS row: full attention over all S tokens ([B,H,1,S] is tiny).
    cls_logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q[:, :, :1], k, preferred_element_type=jnp.float32
    )
    cls_probs = jax.nn.softmax(cls_logits, axis=-1).astype(dtype)
    cls_out = jnp.einsum("bhqk,bhkd->bhqd", cls_probs, v)  # [B,H,1,hd]

    if impl == "pallas" and axis == "time":
        # transpose-free fused time attention on the natural (f, n) layout
        from egovlp_tpu.kernels.pallas_attention import time_attention

        nat = lambda t: t[:, :, 1:].reshape(B * H, frames, patches, hd)
        out_t = time_attention(
            nat(q), nat(k), nat(v),
            cls_k.reshape(B * H, 1, hd), cls_v.reshape(B * H, 1, hd),
        )
        out_patches = out_t.reshape(B, H, frames * patches, hd)
        return jnp.concatenate([cls_out, out_patches], axis=2)

    # --- Patch tokens: grouped attention, flattened to 3-D batched matmuls.
    if axis == "space":
        G, L = frames, patches
    else:
        G, L = patches, frames

    def group(t):
        t = t[:, :, 1:].reshape(B, H, frames, patches, hd)
        if axis == "time":
            t = jnp.swapaxes(t, 2, 3)
        return t.reshape(B * H * G, L, hd)

    qg, kg, vg = group(q), group(k), group(v)

    if impl == "pallas":
        from egovlp_tpu.kernels.pallas_attention import grouped_attention

        out_g = grouped_attention(
            qg.reshape(B * H, G, L, hd),
            kg.reshape(B * H, G, L, hd),
            vg.reshape(B * H, G, L, hd),
            cls_k.reshape(B * H, 1, hd),
            cls_v.reshape(B * H, 1, hd),
        ).reshape(B, H, G, L, hd)
    else:
        # splice CLS k/v in front of every group (reference :117-121)
        ck = jnp.broadcast_to(
            cls_k[:, :, None], (B, H, G, 1, hd)
        ).reshape(B * H * G, 1, hd)
        cv = jnp.broadcast_to(
            cls_v[:, :, None], (B, H, G, 1, hd)
        ).reshape(B * H * G, 1, hd)
        kg = jnp.concatenate([ck, kg], axis=1)  # [BHG, L+1, hd]
        vg = jnp.concatenate([cv, vg], axis=1)

        logits = jnp.einsum(
            "bld,bmd->blm", qg, kg, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out_g = jnp.einsum("blm,bmd->bld", probs, vg)
        out_g = out_g.reshape(B, H, G, L, hd)

    if axis == "time":
        out_g = jnp.swapaxes(out_g, 2, 3)
    out_patches = out_g.reshape(B, H, frames * patches, hd)

    return jnp.concatenate([cls_out, out_patches], axis=2)


import functools as _functools


@_functools.lru_cache(maxsize=64)
def _space_bsd(heads, scale):
    from egovlp_tpu.kernels.pallas_attention import make_space_attention_bsd

    return make_space_attention_bsd(heads, scale)


@_functools.lru_cache(maxsize=64)
def _time_bsd(heads, scale):
    from egovlp_tpu.kernels.pallas_attention import make_time_attention_bsd

    return make_time_attention_bsd(heads, scale)


def _cls_row_parts(qc, kc, vc, kp, vp, heads, scale, dtype):
    """CLS-query full-attention row on the pair layout.

    Logits are built in the same cls-first key order as the fused [B, S, D]
    wrapper so the softmax matches it exactly.  ``kp``/``vp`` may be flat
    ``[B, Sp, D]`` or the grid ``[B, f, n, D]`` — on the grid layout the
    head split is a FREE last-dim reshape and only the tiny f32 logits ever
    get flattened.  Returns ``[B, 1, D]``.
    """
    B, D = kp.shape[0], kp.shape[-1]
    hd = D // heads
    q3c = qc.reshape(B, heads, hd) * scale
    lg_c = jnp.einsum("bhd,bhd->bh", q3c, kc.reshape(B, heads, hd),
                      preferred_element_type=jnp.float32)
    if kp.ndim == 4:
        k5 = kp.reshape(*kp.shape[:3], heads, hd)
        v5 = vp.reshape(*vp.shape[:3], heads, hd)
        lg_p = jnp.einsum("bhd,bfnhd->bhfn", q3c, k5,
                          preferred_element_type=jnp.float32
                          ).reshape(B, heads, -1)
    else:
        Sp = kp.shape[1]
        k5 = kp.reshape(B, Sp, heads, hd)
        v5 = vp.reshape(B, Sp, heads, hd)
        lg_p = jnp.einsum("bhd,bshd->bhs", q3c, k5,
                          preferred_element_type=jnp.float32)
    full = jnp.concatenate([lg_c[:, :, None], lg_p], axis=-1)
    pr = jax.nn.softmax(full, axis=-1).astype(dtype)
    if kp.ndim == 4:
        prp = pr[:, :, 1:].reshape(B, heads, kp.shape[1], kp.shape[2])
        oc = jnp.einsum("bhfn,bfnhd->bhd", prp, v5)
    else:
        oc = jnp.einsum("bhs,bshd->bhd", pr[:, :, 1:], v5)
    oc = oc + pr[:, :, :1] * vc.reshape(B, heads, hd)
    return oc.reshape(B, 1, D)


def _time_xla_parts(qc, kc, vc, qp, kp, vp, *, heads: int, frames: int,
                    patches: int):
    """Time-axis divided attention in pure XLA on the PAIR layout.

    The production 16-frame path ('auto' resolves time to XLA at f >= 16;
    models/video_tower.py::resolve_attention_impls).  Built to minimize HBM
    layout traffic, which dominates the generic concat+head-split fallback
    at this shape (HLO traffic audit, docs/ROUND3.md):

      * no ``[cls; patches]`` concatenation — the pair layout feeds the
        einsums directly (3 x 77 MB copies saved at the 16f shape);
      * ONE fused transpose per tensor: ``[B,f,n,H,hd] -> [B,n,H,f,hd]``
        inside the batched dot, instead of the fallback's separate
        head-split transpose + group swapaxes passes;
      * the CLS key/value are spliced at the LOGIT level — an
        ``[*, f, 1]`` concat (~2.5 MB at 16f), not the ``[*, L+1, hd]``
        k/v group copies (~160 MB) of the generic path.  (For the SPACE
        axis the trade reverses — L=196 makes the logit block much bigger
        than the k/v groups, see the module docstring — which is why this
        fast path is time-only.)

    Semantics identical to ``divided_attention_bsd(..., axis='time',
    impl='xla')`` (reference VarAttention,
    /root/reference/model/video_transformer.py:80-137).

    ``qp/kp/vp`` may be flat ``[B, Sp, D]`` or the grid ``[B, f, n, D]``
    (the tower's native layout); the output rank matches the input.  On
    the grid layout the 5-D head split below is a FREE last-dim reshape
    — on the flat layout it is a physical re-tiling copy (~77 MB per
    tensor at the 16f shape; the audit line that motivated the tower's
    grid layout, scripts/hlo_traffic.py).
    """
    grid_in = qp.ndim == 4
    B, D = qp.shape[0], qp.shape[-1]
    Sp = frames * patches
    H, hd = heads, D // heads
    scale = float(hd) ** -0.5
    dtype = qp.dtype
    f, n = frames, patches

    cls_out = _cls_row_parts(qc, kc, vc, kp, vp, H, scale, dtype)

    q5 = qp.reshape(B, f, n, H, hd)
    k5 = kp.reshape(B, f, n, H, hd)
    v5 = vp.reshape(B, f, n, H, hd)
    # frame-vs-frame logits per (patch column, head): [B, n, H, f, f].
    # q's softmax scale is folded into the (tiny f32) LOGITS rather than
    # multiplied into q — a `q * scale` pass materializes a full
    # [B, f, n, D] copy (~12+12 of them at 16f in the traffic audit)
    lg = jnp.einsum("bqnhd,bknhd->bnhqk", q5, k5,
                    preferred_element_type=jnp.float32) * scale
    # CLS key column, spliced FIRST to match the reference key order
    lg_cls = jnp.einsum("bqnhd,bhd->bnhq", q5, kc.reshape(B, H, hd),
                        preferred_element_type=jnp.float32) * scale
    full = jnp.concatenate([lg_cls[..., None], lg], axis=-1)
    pr = jax.nn.softmax(full, axis=-1).astype(dtype)
    out = jnp.einsum("bnhqk,bknhd->bqnhd", pr[..., 1:], v5)
    out = out + jnp.einsum("bnhq,bhd->bqnhd", pr[..., 0],
                           vc.reshape(B, H, hd))
    return cls_out, out.reshape((B, f, n, D) if grid_in else (B, Sp, D))


def _time_xla_parts_v2(qc, kc, vc, qp, kp, vp, *, heads: int, frames: int,
                       patches: int):
    """Time-axis XLA attention with CANONICAL shared relayouts.

    Same math as ``_time_xla_parts``, but the (n, H)-major layout the
    batched dots want is produced by ONE explicit transpose per tensor
    (q/k/v in, out back) that every consumer shares.  In v1 the layout
    oscillation is left to XLA's layout assignment, which re-lays each
    tensor per consumer — the device profile of the 16f step attributes
    ~60 ms/step of 'data formatting' copies to this path (~10 copies of
    [B,f,n,H,hd]-sized tensors per block fwd+bwd, trace_hlo_stats); the
    minimal count is 4 per direction.  A/B'd on the real chip by
    scripts/attn16_ab.py with variant 'mixed2'.
    """
    grid_in = qp.ndim == 4
    B, D = qp.shape[0], qp.shape[-1]
    Sp = frames * patches
    H, hd = heads, D // heads
    scale = float(hd) ** -0.5
    dtype = qp.dtype
    f, n = frames, patches

    cls_out = _cls_row_parts(qc, kc, vc, kp, vp, H, scale, dtype)

    def to6(t):
        # [B,f,n,D] -> [B,n,H,f,hd]: the head split is a free last-dim
        # reshape on the grid; the transpose is the one shared relayout
        return t.reshape(B, f, n, H, hd).transpose(0, 2, 3, 1, 4)

    q6, k6, v6 = to6(qp), to6(kp), to6(vp)
    kc3 = kc.reshape(B, H, hd)
    vc3 = vc.reshape(B, H, hd)
    # every dot below consumes the SAME [B,n,H,...] batch-major layout
    lg = jnp.einsum("bnhqd,bnhkd->bnhqk", q6, k6,
                    preferred_element_type=jnp.float32) * scale
    lg_cls = jnp.einsum("bnhqd,bhd->bnhq", q6, kc3,
                        preferred_element_type=jnp.float32) * scale
    full = jnp.concatenate([lg_cls[..., None], lg], axis=-1)
    pr = jax.nn.softmax(full, axis=-1).astype(dtype)
    out6 = jnp.einsum("bnhqk,bnhkd->bnhqd", pr[..., 1:], v6)
    out6 = out6 + pr[..., 0][..., None] * vc3[:, None, :, None, :]
    out = out6.transpose(0, 3, 1, 2, 4)  # back to [B,f,n,H,hd]
    return cls_out, out.reshape((B, f, n, D) if grid_in else (B, Sp, D))


def divided_attention_parts(qc, kc, vc, qp, kp, vp, *, heads: int,
                            frames: int, patches: int, axis: str,
                            impl: str = "pallas"):
    """Divided attention with the CLS token carried SEPARATELY.

    Args:
      qc, kc, vc: ``[B, 1, D]`` CLS projections.
      qp, kp, vp: patch-token projections, flat ``[B, frames*patches, D]``
        or the grid layout ``[B, frames, patches, D]`` (the tower's native
        form: the Pallas kernels consume the grid directly, so NO
        re-tiling reshape copy is paid on either side of the kernel —
        at the 16f shape the flat layout costs ~30 GB/step of pure layout
        copies, scripts/hlo_traffic.py).

    Returns ``(cls_out [B, 1, D], out_p)`` with ``out_p`` in the same
    rank/layout as the ``qp`` input.

    This is the zero-copy fast path: when the tower keeps CLS and patch
    activations as two arrays, every reshape here is free (contiguous), so
    between the qkv Dense and the output projection NO slice/concat pass
    touches HBM — measured ~1.4 ms per application at the pretrain shape
    (B=32 f=4 n=196 D=768) for the [B, S, D] wrapper's splice traffic,
    about as much as the fused kernel itself.  Semantics are identical to
    ``divided_attention_bsd`` (reference VarAttention,
    /root/reference/model/video_transformer.py:80-137).
    """
    grid_in = qp.ndim == 4
    B, D = qp.shape[0], qp.shape[-1]
    Sp = frames * patches
    hd = D // heads
    scale = float(hd) ** -0.5
    dtype = qp.dtype

    if impl != "pallas":
        if axis == "time":
            # native pair-layout XLA path: ~3x less HBM layout traffic
            # than the concat+head-split fallback (see _time_xla_parts;
            # rank-preserving, so the grid layout passes straight through).
            # 'xla2' = canonical shared relayouts (_time_xla_parts_v2).
            fn = _time_xla_parts_v2 if impl == "xla2" else _time_xla_parts
            return fn(qc, kc, vc, qp, kp, vp, heads=heads,
                      frames=frames, patches=patches)
        # space XLA fallback: the generic concat path wants flat [B, S, D]
        # (non-production on TPU — 'auto' always picks the space kernel;
        # on CPU/interpret the flatten is layout-free)
        flat = (lambda t: t.reshape(B, Sp, D)) if grid_in else (lambda t: t)
        q = jnp.concatenate([qc, flat(qp)], axis=1)
        k = jnp.concatenate([kc, flat(kp)], axis=1)
        v = jnp.concatenate([vc, flat(vp)], axis=1)
        out = divided_attention_bsd(q, k, v, heads=heads, frames=frames,
                                    patches=patches, axis=axis, impl=impl)
        op = out[:, 1:]
        return out[:, :1], (op.reshape(B, frames, patches, D) if grid_in
                            else op)

    # CLS row: full attention over [cls; patches] (logits built in the same
    # cls-first order as the fused wrapper, so softmax matches exactly).
    cls_out = _cls_row_parts(qc, kc, vc, kp, vp, heads, scale, dtype)

    # patch tokens: grouped fused kernel on the [B, f, n, D] grid — the
    # kernels' native operand layout, so a grid-layout caller pays ZERO
    # reshape copies here (a flat caller pays the f x n re-tiling)
    if grid_in:
        qg, kg, vg = qp, kp, vp
    else:
        qg = qp.reshape(B, frames, patches, D)
        kg = kp.reshape(B, frames, patches, D)
        vg = vp.reshape(B, frames, patches, D)
    if axis == "space":
        out_p = _space_bsd(heads, scale)(qg, kg, vg, kc, vc)
    else:
        # the time kernel pads patch columns to its probed n-block
        # internally (pallas_attention._time_fwd_bsd_call)
        out_p = _time_bsd(heads, scale)(qg, kg, vg, kc, vc)
    return cls_out, (out_p if grid_in else out_p.reshape(B, Sp, D))


def divided_attention_bsd(q, k, v, *, heads: int, frames: int, patches: int,
                          axis: str, impl: str = "pallas") -> jax.Array:
    """Divided attention on UN-split [B, S, D] projections.

    The transpose-free fast path: heads are lane-sliced inside the Pallas
    kernels (pallas_attention.py: *_bsd), so between the qkv Dense and the
    output projection no head transpose or scaling pass ever touches HBM.
    ``impl != 'pallas'`` falls back to the head-split XLA op.
    """
    B, S, D = q.shape
    hd = D // heads
    scale = float(hd) ** -0.5

    if impl != "pallas":
        def split(t):
            return t.reshape(B, S, heads, hd).transpose(0, 2, 1, 3)

        out = divided_attention(split(q) * scale, split(k), split(v),
                                frames=frames, patches=patches, axis=axis,
                                impl=impl)
        return out.transpose(0, 2, 1, 3).reshape(B, S, D)

    dtype = q.dtype
    q4 = q.reshape(B, S, heads, hd)
    k4 = k.reshape(B, S, heads, hd)
    v4 = v.reshape(B, S, heads, hd)

    # CLS row (full attention) in XLA — one token, einsum avoids transposes.
    cls_logits = jnp.einsum(
        "bhd,bshd->bhs", q4[:, 0] * scale, k4,
        preferred_element_type=jnp.float32,
    )
    cls_p = jax.nn.softmax(cls_logits, axis=-1).astype(dtype)
    cls_out = jnp.einsum("bhs,bshd->bhd", cls_p, v4).reshape(B, 1, D)

    qp = q[:, 1:].reshape(B, frames, patches, D)
    kp = k[:, 1:].reshape(B, frames, patches, D)
    vp = v[:, 1:].reshape(B, frames, patches, D)
    ck = k[:, :1]
    cv = v[:, :1]
    if axis == "space":
        out_p = _space_bsd(heads, scale)(qp, kp, vp, ck, cv)
    else:
        out_p = _time_bsd(heads, scale)(qp, kp, vp, ck, cv)
    out_p = out_p.reshape(B, frames * patches, D)
    return jnp.concatenate([cls_out, out_p], axis=1)
