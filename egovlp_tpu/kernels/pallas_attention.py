"""Pallas fused grouped attention with CLS splice (forward + backward).

The divided space-time attention's grouped part (egovlp_tpu/kernels/
divided_attention.py) is bandwidth-bound under plain XLA: the [L, L+1]
probability matrices round-trip through HBM between the two matmuls
(~240 MB/layer for the space axis at the EgoVLP pretraining shape).  Each
group is small enough to live entirely in VMEM (L <= ~256, hd = 64), so a
single kernel program computes logits -> softmax -> weighted sum per
(batch*head, group) block without ever writing probabilities to HBM; the
backward kernel recomputes them in VMEM (flash-attention-style) and emits
dq/dk/dv plus per-group CLS k/v gradients (summed outside).

No online-softmax tiling is needed: the whole group fits on-chip.  Softmax
statistics are computed in float32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
    q = q_ref[0, 0]          # [L, hd]
    k = k_ref[0, 0]          # [L, hd]
    v = v_ref[0, 0]          # [L, hd]
    ck = ck_ref[0]           # [1, hd]
    cv = cv_ref[0]           # [1, hd]

    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [L, L]
    cls_col = jnp.dot(q, ck.T, preferred_element_type=jnp.float32)  # [L, 1]
    full = jnp.concatenate([cls_col, logits], axis=1)  # [L, L+1]

    m = jnp.max(full, axis=1, keepdims=True)
    p = jnp.exp(full - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    p = (p / s).astype(q.dtype)

    out = jnp.dot(p[:, 1:], v, preferred_element_type=jnp.float32)
    out = out + p[:, :1].astype(jnp.float32) * cv.astype(jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    ck = ck_ref[0]
    cv = cv_ref[0]
    do = do_ref[0, 0].astype(jnp.float32)  # [L, hd]

    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    cls_col = jnp.dot(q, ck.T, preferred_element_type=jnp.float32)
    full = jnp.concatenate([cls_col, logits], axis=1)
    m = jnp.max(full, axis=1, keepdims=True)
    e = jnp.exp(full - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s  # [L, L+1] f32

    # value matrix incl. CLS row 0: out = p @ [cv; v]
    dv_full_lhs = p.astype(do.dtype)
    # dP = do @ [cv; v].T
    dp_cls = jnp.dot(do, cv.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)  # [L, 1]
    dp = jnp.dot(do, v.astype(jnp.float32).T,
                 preferred_element_type=jnp.float32)      # [L, L]
    dp_full = jnp.concatenate([dp_cls, dp], axis=1)

    # softmax backward: dlogits = p * (dp - sum(dp * p))
    inner = jnp.sum(dp_full * p, axis=1, keepdims=True)
    dl = p * (dp_full - inner)  # [L, L+1] f32

    dq = jnp.dot(dl[:, 1:].astype(q.dtype), k,
                 preferred_element_type=jnp.float32)
    dq = dq + jnp.dot(dl[:, :1].astype(q.dtype), ck,
                      preferred_element_type=jnp.float32)
    dk = jnp.dot(dl[:, 1:].T.astype(q.dtype), q,
                 preferred_element_type=jnp.float32)
    dv = jnp.dot(p[:, 1:].T.astype(do.dtype), do.astype(do.dtype),
                 preferred_element_type=jnp.float32)
    dck = jnp.dot(dl[:, :1].T.astype(q.dtype), q,
                  preferred_element_type=jnp.float32)  # [1, hd]
    dcv = jnp.dot(p[:, :1].T.astype(do.dtype), do,
                  preferred_element_type=jnp.float32)  # [1, hd]

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    dck_ref[0, 0] = dck.astype(dck_ref.dtype)
    dcv_ref[0, 0] = dcv.astype(dcv_ref.dtype)


def _specs(BH, G, L, hd):
    blk = pl.BlockSpec((1, 1, L, hd), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, hd), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return blk, cls


def _fwd_call(q, k, v, cls_k, cls_v):
    BH, G, L, hd = q.shape
    blk, cls = _specs(BH, G, L, hd)
    flops = 2 * BH * G * L * (L + 1) * hd * 2
    return pl.pallas_call(
        _fwd_kernel,
        grid=(BH, G),
        in_specs=[blk, blk, blk, cls, cls],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((BH, G, L, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=BH * G * L * (L + 1),
            bytes_accessed=4 * BH * G * L * hd * q.dtype.itemsize,
        ),
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v)


def _bwd_call(q, k, v, cls_k, cls_v, do):
    BH, G, L, hd = q.shape
    blk, cls = _specs(BH, G, L, hd)
    cls_out = pl.BlockSpec((1, 1, 1, hd), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    shapes = (
        jax.ShapeDtypeStruct((BH, G, L, hd), q.dtype),   # dq
        jax.ShapeDtypeStruct((BH, G, L, hd), q.dtype),   # dk
        jax.ShapeDtypeStruct((BH, G, L, hd), q.dtype),   # dv
        jax.ShapeDtypeStruct((BH, G, 1, hd), q.dtype),   # dck per group
        jax.ShapeDtypeStruct((BH, G, 1, hd), q.dtype),   # dcv per group
    )
    dq, dk, dv, dck_g, dcv_g = pl.pallas_call(
        _bwd_kernel,
        grid=(BH, G),
        in_specs=[blk, blk, blk, cls, cls, blk],
        out_specs=(blk, blk, blk, cls_out, cls_out),
        out_shape=shapes,
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v, do)
    # CLS k/v are shared across groups -> sum their per-group grads
    dck = jnp.sum(dck_g, axis=(1, 2))[:, None]  # [BH, 1, hd]
    dcv = jnp.sum(dcv_g, axis=(1, 2))[:, None]
    return dq, dk, dv, dck, dcv


@jax.custom_vjp
def grouped_attention(q, k, v, cls_k, cls_v):
    """Fused grouped attention.

    q/k/v: [BH, G, L, hd] (q pre-scaled); cls_k/cls_v: [BH, 1, hd] the CLS
    key/value spliced in front of every group.  Returns [BH, G, L, hd].
    """
    return _fwd_call(q, k, v, cls_k, cls_v)


def _ga_fwd(q, k, v, cls_k, cls_v):
    return _fwd_call(q, k, v, cls_k, cls_v), (q, k, v, cls_k, cls_v)


def _ga_bwd(res, do):
    return _bwd_call(*res, do)


grouped_attention.defvjp(_ga_fwd, _ga_bwd)


# --------------------------------------------------------------------------
# time-axis attention (frames per patch column), transpose-free
# --------------------------------------------------------------------------
#
# The time-axis groups are tiny (L = frames <= 16) and there are n = 196 of
# them per (batch, head): the batched-matmul formulation wastes the MXU
# ([f, hd] @ [hd, f+1] tiles) AND needs a [B,H,f,n,hd] -> [B,H,n,f,hd]
# transpose of every operand.  This kernel instead works directly on the
# natural (f, n) layout: for each query frame fi the logits live as a
# [f+1, n] tile (lanes = patches), softmax reduces across the <=17 sublane
# rows, and outputs accumulate as [n, hd] broadcast multiply-adds on the
# VPU.  No transpose, no HBM probabilities, one read of q/k/v per (b, h).


def _time_fwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
    f = q_ref.shape[1]
    ck = ck_ref[0].astype(jnp.float32)   # [1, hd]
    cv = cv_ref[0].astype(jnp.float32)
    k = [k_ref[0, g].astype(jnp.float32) for g in range(f)]   # each [n, hd]
    v = [v_ref[0, g].astype(jnp.float32) for g in range(f)]

    for fi in range(f):
        qf = q_ref[0, fi].astype(jnp.float32)  # [n, hd]
        rows = [jnp.sum(qf * ck, axis=-1)]     # cls logit, [n]
        rows += [jnp.sum(qf * k[g], axis=-1) for g in range(f)]
        logits = jnp.stack(rows, axis=0)       # [f+1, n]
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)
        out = p[0][:, None] * cv
        for g in range(f):
            out = out + p[g + 1][:, None] * v[g]
        o_ref[0, fi] = out.astype(o_ref.dtype)


def _time_bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
    f = q_ref.shape[1]
    ck = ck_ref[0].astype(jnp.float32)
    cv = cv_ref[0].astype(jnp.float32)
    k = [k_ref[0, g].astype(jnp.float32) for g in range(f)]
    v = [v_ref[0, g].astype(jnp.float32) for g in range(f)]

    dk_acc = [jnp.zeros_like(k[0]) for _ in range(f)]
    dv_acc = [jnp.zeros_like(v[0]) for _ in range(f)]
    dck = jnp.zeros_like(ck)
    dcv = jnp.zeros_like(cv)

    for fi in range(f):
        qf = q_ref[0, fi].astype(jnp.float32)
        do = do_ref[0, fi].astype(jnp.float32)  # [n, hd]
        rows = [jnp.sum(qf * ck, axis=-1)]
        rows += [jnp.sum(qf * k[g], axis=-1) for g in range(f)]
        logits = jnp.stack(rows, axis=0)
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)  # [f+1, n]

        dp = [jnp.sum(do * cv, axis=-1)]
        dp += [jnp.sum(do * v[g], axis=-1) for g in range(f)]
        dp = jnp.stack(dp, axis=0)                 # [f+1, n]
        inner = jnp.sum(dp * p, axis=0, keepdims=True)
        dl = p * (dp - inner)                      # [f+1, n]

        dq = dl[0][:, None] * ck
        dck = dck + jnp.sum(dl[0][:, None] * qf, axis=0, keepdims=True)
        dcv = dcv + jnp.sum(p[0][:, None] * do, axis=0, keepdims=True)
        for g in range(f):
            dq = dq + dl[g + 1][:, None] * k[g]
            dk_acc[g] = dk_acc[g] + dl[g + 1][:, None] * qf
            dv_acc[g] = dv_acc[g] + p[g + 1][:, None] * do
        dq_ref[0, fi] = dq.astype(dq_ref.dtype)

    for g in range(f):
        dk_ref[0, g] = dk_acc[g].astype(dk_ref.dtype)
        dv_ref[0, g] = dv_acc[g].astype(dv_ref.dtype)
    dck_ref[0] = dck.astype(dck_ref.dtype)
    dcv_ref[0] = dcv.astype(dcv_ref.dtype)


def _time_specs(BH, f, n, hd):
    blk = pl.BlockSpec((1, f, n, hd), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return blk, cls


def _time_fwd_call(q, k, v, cls_k, cls_v):
    BH, f, n, hd = q.shape
    blk, cls = _time_specs(BH, f, n, hd)
    return pl.pallas_call(
        _time_fwd_kernel,
        grid=(BH,),
        in_specs=[blk, blk, blk, cls, cls],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((BH, f, n, hd), q.dtype),
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v)


def _time_bwd_call(q, k, v, cls_k, cls_v, do):
    BH, f, n, hd = q.shape
    blk, cls = _time_specs(BH, f, n, hd)
    shapes = (
        jax.ShapeDtypeStruct((BH, f, n, hd), q.dtype),
        jax.ShapeDtypeStruct((BH, f, n, hd), q.dtype),
        jax.ShapeDtypeStruct((BH, f, n, hd), q.dtype),
        jax.ShapeDtypeStruct((BH, 1, hd), q.dtype),
        jax.ShapeDtypeStruct((BH, 1, hd), q.dtype),
    )
    return pl.pallas_call(
        _time_bwd_kernel,
        grid=(BH,),
        in_specs=[blk, blk, blk, cls, cls, blk],
        out_specs=(blk, blk, blk, cls, cls),
        out_shape=shapes,
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v, do)


@jax.custom_vjp
def time_attention(q, k, v, cls_k, cls_v):
    """Fused time-axis attention on the natural (f, n) layout.

    q/k/v: [BH, f, n, hd] (q pre-scaled); cls_k/cls_v: [BH, 1, hd].
    For every patch column j, query frame fi attends over frames
    {CLS, 0..f-1} at the same column.  Returns [BH, f, n, hd].
    """
    return _time_fwd_call(q, k, v, cls_k, cls_v)


def _ta_fwd(q, k, v, cls_k, cls_v):
    return _time_fwd_call(q, k, v, cls_k, cls_v), (q, k, v, cls_k, cls_v)


def _ta_bwd(res, do):
    return _time_bwd_call(*res, do)


time_attention.defvjp(_ta_fwd, _ta_bwd)


# --------------------------------------------------------------------------
# transpose-free [B, S, D] kernels: heads are sliced via lane-blocking
# --------------------------------------------------------------------------
#
# The (B, H, S, hd) kernels above require materializing head-split
# transposes of every operand (q/k/v/out, ~38 MB each at the pretraining
# shape, x24 attention sites).  These variants consume the qkv projections
# in their natural [B, frames, patches, D] layout: a program owns a
# 128-lane slice of D (Mosaic requires last block dims of 128), i.e.
# 128/hd heads, and splits the individual hd-wide heads with static lane
# slices in VMEM — no HBM data movement between the Dense projections and
# the kernel.  q-scaling is applied in-kernel (one less HBM pass).

LANE = 128

# exp2-base softmax: fold log2(e) into the q scaling so the VPU runs its
# native power-of-two exponent instead of exp (which lowers to exp2 plus a
# full-tile multiply).  softmax is invariant under the base change; ln(2)
# un-does the fold where the raw logit scale is needed (dk).
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _lane_block(D: int, hd: int) -> int:
    """Lane-block width: 128 when D is a multiple of it (Mosaic's minor-dim
    requirement), otherwise the full D (also allowed).  Must be a multiple
    of the head width."""
    lb = LANE if D % LANE == 0 else D
    assert lb % hd == 0, (D, hd)
    return lb


def _mk_space_fwd_bsd(scale, hd, hpb):
    # CLS k/v are CONCATENATED into the group tiles in VMEM (a [1, hd]
    # sublane copy) so the logits and output matmuls run once over L+1
    # keys, instead of issuing a nearly-empty N=1 MXU pass per head for
    # the CLS column.  Measured (v5e, scan-amortized, B=32 4f): fwd
    # 1.45 -> 1.10 ms/block; with the matching backward 4.81 -> 2.89.
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        for hp in range(hpb):
            c = slice(hp * hd, (hp + 1) * hd)
            q = q_ref[0, 0, :, c]
            kc = jnp.concatenate([ck_ref[0, :, c], k_ref[0, 0, :, c]],
                                 axis=0)          # [L+1, hd], CLS row 0
            vc = jnp.concatenate([cv_ref[0, :, c], v_ref[0, 0, :, c]],
                                 axis=0)
            qs = (q.astype(jnp.float32) * scale).astype(kc.dtype)
            logits = jnp.dot(qs, kc.T, preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=1, keepdims=True)
            pr = jnp.exp(logits - m)
            pr = (pr / jnp.sum(pr, axis=1, keepdims=True)).astype(vc.dtype)
            out = jnp.dot(pr, vc, preferred_element_type=jnp.float32)
            o_ref[0, 0, :, c] = out.astype(o_ref.dtype)

    return kernel


def _mk_space_bwd_bsd(scale, hd, hpb):
    # CLS-concatenated like the forward: the probability/grad matrices
    # carry the CLS column as row 0 of [L+1]-key tiles, so dq/dk/dv/dcls
    # come out of THREE full matmuls (dp, dq, dkc/dvc pairs) instead of
    # seven with four nearly-empty CLS passes (see _mk_space_fwd_bsd).
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
               dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
        for hp in range(hpb):
            c = slice(hp * hd, (hp + 1) * hd)
            q = q_ref[0, 0, :, c]
            kc = jnp.concatenate([ck_ref[0, :, c], k_ref[0, 0, :, c]],
                                 axis=0)
            vc = jnp.concatenate([cv_ref[0, :, c], v_ref[0, 0, :, c]],
                                 axis=0)
            do = do_ref[0, 0, :, c].astype(jnp.float32)

            qs = (q.astype(jnp.float32) * scale).astype(kc.dtype)
            logits = jnp.dot(qs, kc.T, preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            pr = e / jnp.sum(e, axis=1, keepdims=True)

            dp = jnp.dot(do, vc.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)
            inner = jnp.sum(dp * pr, axis=1, keepdims=True)
            dl = (pr * (dp - inner)).astype(kc.dtype)

            dq = jnp.dot(dl, kc, preferred_element_type=jnp.float32)
            dq_ref[0, 0, :, c] = (dq * scale).astype(dq_ref.dtype)
            dkc = jnp.dot(dl.T, qs, preferred_element_type=jnp.float32)
            dvc = jnp.dot(pr.T.astype(do.dtype), do,
                          preferred_element_type=jnp.float32)
            dck_ref[0, 0, :, c] = dkc[:1].astype(dck_ref.dtype)
            dk_ref[0, 0, :, c] = dkc[1:].astype(dk_ref.dtype)
            dcv_ref[0, 0, :, c] = dvc[:1].astype(dcv_ref.dtype)
            dv_ref[0, 0, :, c] = dvc[1:].astype(dv_ref.dtype)

    return kernel


def _space_kernel_variant() -> str:
    """'v3' (default) = head-packed dense matmuls over block-stacked
    lane-masked k/v (r5: won 14/16 same-session rounds vs v2, 4f fwd+bwd
    2.00 vs 2.09 ms/block, 16f 4.56 vs 4.65 — scripts/space_kernel_ab.py);
    'v2' = per-head exp2 softmax, deferred normalisation, input-dtype
    backward matmuls; 'v1' = the r2/r3 divide-then-matmul bodies with f32
    dp/dv matmuls (EGOVLP_SPACE_KERNEL overrides; consulted at trace
    time)."""
    import os

    var = os.environ.get("EGOVLP_SPACE_KERNEL", "v3")
    if var not in ("v1", "v2", "v2x", "v3"):
        raise ValueError(
            f"EGOVLP_SPACE_KERNEL={var!r}: expected one of v1/v2/v2x/v3")
    return var


def _space_fwd_body(scale, hd, hpb):
    var = _space_kernel_variant()
    mk = {"v1": _mk_space_fwd_bsd, "v2": _mk_space_fwd_bsd_v2,
          "v2x": _mk_space_fwd_bsd_v2, "v3": _mk_space_fwd_bsd_v3}[var]
    # head-packing is a no-op at one head per lane block
    if var == "v3" and hpb == 1:
        mk = _mk_space_fwd_bsd_v2
    return mk(scale, hd, hpb)


def _space_bwd_body(scale, hd, hpb):
    var = _space_kernel_variant()
    if var == "v2x":
        return _mk_space_bwd_bsd_v2(scale, hd, hpb, f32_mm=True)
    if var == "v3" and hpb > 1:
        return _mk_space_bwd_bsd_v3(scale, hd, hpb)
    mk = {"v1": _mk_space_bwd_bsd, "v2": _mk_space_bwd_bsd_v2,
          "v3": _mk_space_bwd_bsd_v2}[var]
    return mk(scale, hd, hpb)


def _mk_space_fwd_bsd_v2(scale, hd, hpb):
    # v1 with the softmax VPU tail trimmed (the matmuls are structurally
    # K=hd and already minimal):
    #   * exp2-base softmax — log2(e) folded into the q scaling (see
    #     _LOG2E above), saving a [L, L+1] multiply inside every exp;
    #   * deferred normalisation (the time-v2 trick): the value matmul
    #     consumes the UNNORMALIZED exp and one [L, hd] multiply by the
    #     reciprocal row sum replaces the [L, L+1] probability divide.
    # Measured on v5e (scripts/space_kernel_ab.py, scan-amortized):
    # see docs/ROUND4.md.
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        for hp in range(hpb):
            c = slice(hp * hd, (hp + 1) * hd)
            q = q_ref[0, 0, :, c]
            kc = jnp.concatenate([ck_ref[0, :, c], k_ref[0, 0, :, c]],
                                 axis=0)          # [L+1, hd], CLS row 0
            vc = jnp.concatenate([cv_ref[0, :, c], v_ref[0, 0, :, c]],
                                 axis=0)
            qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(kc.dtype)
            logits = jnp.dot(qs, kc.T, preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp2(logits - m)
            rs = 1.0 / jnp.sum(e, axis=1, keepdims=True)
            out = jnp.dot(e.astype(vc.dtype), vc,
                          preferred_element_type=jnp.float32)
            o_ref[0, 0, :, c] = (out * rs).astype(o_ref.dtype)

    return kernel


def _mk_space_bwd_bsd_v2(scale, hd, hpb, f32_mm=False):
    # backward of the exp2/deferred-norm formulation.  Beyond the v1
    # structure it keeps the dp and dv matmul operands in the INPUT dtype
    # (bf16 in production): v1 upcast the already-bf16 do/v operands and
    # ran those two [L, L+1]-output matmuls on the MXU's (much slower)
    # f32 path for zero information gain; dv's probability operand is cast
    # to the input dtype exactly like the forward's value matmul (and the
    # XLA oracle's own backward).  In the f32 CPU/interpret tests every
    # cast is a no-op, so v1 and v2 still match to f32 rounding.
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
               dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
        for hp in range(hpb):
            c = slice(hp * hd, (hp + 1) * hd)
            q = q_ref[0, 0, :, c]
            kc = jnp.concatenate([ck_ref[0, :, c], k_ref[0, 0, :, c]],
                                 axis=0)
            vc = jnp.concatenate([cv_ref[0, :, c], v_ref[0, 0, :, c]],
                                 axis=0)
            do = do_ref[0, 0, :, c]                    # input dtype
            # v2x: f32 dp/dv matmul operands (the v1 behavior) — only the
            # dp/dv matmuls differ; dl/dq/dk stay in the input dtype
            dom = do.astype(jnp.float32) if f32_mm else do
            vm = vc.astype(jnp.float32) if f32_mm else vc

            qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(kc.dtype)
            logits = jnp.dot(qs, kc.T, preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp2(logits - m)
            rs = 1.0 / jnp.sum(e, axis=1, keepdims=True)
            pr = e * rs

            dp = jnp.dot(dom, vm.T, preferred_element_type=jnp.float32)
            inner = jnp.sum(dp * pr, axis=1, keepdims=True)
            dl = (pr * (dp - inner)).astype(kc.dtype)

            dq = jnp.dot(dl, kc, preferred_element_type=jnp.float32)
            dq_ref[0, 0, :, c] = (dq * scale).astype(dq_ref.dtype)
            # qs carries the extra log2(e) factor; ln(2) restores dk's scale
            dkc = jnp.dot(dl.T, qs,
                          preferred_element_type=jnp.float32) * _LN2
            dvc = jnp.dot(pr.astype(dom.dtype).T, dom,
                          preferred_element_type=jnp.float32)
            dck_ref[0, 0, :, c] = dkc[:1].astype(dck_ref.dtype)
            dk_ref[0, 0, :, c] = dkc[1:].astype(dk_ref.dtype)
            dcv_ref[0, 0, :, c] = dvc[:1].astype(dcv_ref.dtype)
            dv_ref[0, 0, :, c] = dvc[1:].astype(dv_ref.dtype)

    return kernel


def _space_pack_mats(Lk, lb, hd, hpb):
    """Lane-mask / selector matrices for the head-packed v3 bodies.

    ``lane [Lk, lb]``: lane l belongs to head l // hd (used to build the
    block-stacked masked k/v copies and to extract per-head rows from the
    packed dk/dv products).  ``sel [hpb*Lk, hpb]``: packed column i belongs
    to head i // Lk (per-head row sums of the packed [L, hpb*Lk] logits).
    ``seg [lb, hpb]``: per-head scalars -> lane broadcast (as _seg_mats)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (Lk, lb), 1) // hd
    ci = jax.lax.broadcasted_iota(jnp.int32, (hpb * Lk, hpb), 0) // Lk
    hj = jax.lax.broadcasted_iota(jnp.int32, (hpb * Lk, hpb), 1)
    sel = (ci == hj).astype(jnp.float32)
    li = jax.lax.broadcasted_iota(jnp.int32, (lb, hpb), 0) // hd
    hi = jax.lax.broadcasted_iota(jnp.int32, (lb, hpb), 1)
    seg = (li == hi).astype(jnp.float32)
    return lane, sel, seg


def _packed_rowmax(logits, sel, Lk, hpb):
    """Per-head row max of head-packed logits, broadcast back to columns.

    A max SHARED across the hpb packed heads is not stable: when one
    head's scaled max logit exceeds its block-mate's by more than ~126
    log2 units, the weaker head's whole exp2 row underflows to exactly 0,
    its row sum hits 0 and 1/rs produces inf -> NaN outputs/grads (v2's
    per-head max guaranteed rs >= 1).  hpb masked VPU maxes + one tiny
    [L, hpb] x [hpb, hpb*Lk] broadcast matmul restore the per-head max."""
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) // Lk
    mh = jnp.concatenate(
        [jnp.max(jnp.where(cols == hp, logits, -jnp.inf), axis=1,
                 keepdims=True) for hp in range(hpb)], axis=1)  # [L, hpb]
    return jnp.dot(mh, sel.T, preferred_element_type=jnp.float32)


def _mk_space_fwd_bsd_v3(scale, hd, hpb):
    # HEAD-PACKED formulation (the time-v2/v3 trick applied to space): all
    # hpb heads of the 128-lane block go through ONE dense K=lb logits
    # matmul against block-stacked lane-masked keys ([hpb*(L+1), lb]) and
    # ONE K=hpb*(L+1) value matmul — 2 MXU ops per block instead of v2's
    # 2*hpb ops at K-or-N = hd.  Same useful MACs (the mask zeros replace
    # the array half K=hd leaves idle); the candidate win is halved weight
    # -load/pipeline-fill overhead and one fused softmax pass.  The row
    # max must stay PER-HEAD (_packed_rowmax): a shared max underflows
    # the weaker head's whole row when packed heads' maxima diverge.
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        L, lb = q_ref.shape[2], q_ref.shape[3]
        Lk = L + 1
        lane, sel, seg = _space_pack_mats(Lk, lb, hd, hpb)
        kc = jnp.concatenate([ck_ref[0], k_ref[0, 0]], axis=0)   # [Lk, lb]
        vc = jnp.concatenate([cv_ref[0], v_ref[0, 0]], axis=0)
        zero = jnp.zeros((), kc.dtype)
        kst = jnp.concatenate(
            [jnp.where(lane == hp, kc, zero) for hp in range(hpb)], axis=0)
        vst = jnp.concatenate(
            [jnp.where(lane == hp, vc, zero) for hp in range(hpb)], axis=0)
        qs = (q_ref[0, 0].astype(jnp.float32) * (scale * _LOG2E)
              ).astype(kc.dtype)
        logits = jax.lax.dot_general(
            qs, kst, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [L, hpb*Lk]
        m = _packed_rowmax(logits, sel, Lk, hpb)
        e = jnp.exp2(logits - m)
        out = jnp.dot(e.astype(vst.dtype), vst,
                      preferred_element_type=jnp.float32)  # [L, lb]
        rs = jnp.dot(e, sel, preferred_element_type=jnp.float32)  # [L, hpb]
        inv_lanes = jnp.dot(1.0 / rs, seg.T,
                            preferred_element_type=jnp.float32)   # [L, lb]
        o_ref[0, 0] = (out * inv_lanes).astype(o_ref.dtype)

    return kernel


def _mk_space_bwd_bsd_v3(scale, hd, hpb):
    # backward of the head-packed formulation: dp/dq run packed like the
    # forward; the dk/dv products come from ONE [hpb*Lk, lb] matmul each
    # (contract over L), from which head hp's rows are its lane-masked
    # block — extraction is hpb cheap elementwise selects.
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
               dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
        L, lb = q_ref.shape[2], q_ref.shape[3]
        Lk = L + 1
        lane, sel, seg = _space_pack_mats(Lk, lb, hd, hpb)
        kc = jnp.concatenate([ck_ref[0], k_ref[0, 0]], axis=0)
        vc = jnp.concatenate([cv_ref[0], v_ref[0, 0]], axis=0)
        zero = jnp.zeros((), kc.dtype)
        kst = jnp.concatenate(
            [jnp.where(lane == hp, kc, zero) for hp in range(hpb)], axis=0)
        vst = jnp.concatenate(
            [jnp.where(lane == hp, vc, zero) for hp in range(hpb)], axis=0)
        do = do_ref[0, 0]                                  # input dtype
        qs = (q_ref[0, 0].astype(jnp.float32) * (scale * _LOG2E)
              ).astype(kc.dtype)

        logits = jax.lax.dot_general(
            qs, kst, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = _packed_rowmax(logits, sel, Lk, hpb)
        e = jnp.exp2(logits - m)
        rs = jnp.dot(e, sel, preferred_element_type=jnp.float32)
        p = e * jnp.dot(1.0 / rs, sel.T,
                        preferred_element_type=jnp.float32)  # [L, hpb*Lk]

        dp = jax.lax.dot_general(
            do, vst, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [L, hpb*Lk]
        inner = jnp.dot(dp * p, sel, preferred_element_type=jnp.float32)
        dl = (p * (dp - jnp.dot(inner, sel.T,
                                preferred_element_type=jnp.float32))
              ).astype(kc.dtype)

        dq = jnp.dot(dl, kst, preferred_element_type=jnp.float32)  # [L, lb]
        dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)

        # packed cross products: [hpb*Lk, lb]; head hp's rows valid only in
        # its own lanes (the other lanes hold cross-head garbage) — the
        # lane mask extracts and sums the per-head blocks back to [Lk, lb]
        dkp = jax.lax.dot_general(dl, qs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) * _LN2
        dvp = jax.lax.dot_general(p.astype(do.dtype), do,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        zf = jnp.zeros((), jnp.float32)
        dkc = dvc = None
        for hp in range(hpb):
            blk_k = jnp.where(lane == hp, dkp[hp * Lk:(hp + 1) * Lk], zf)
            blk_v = jnp.where(lane == hp, dvp[hp * Lk:(hp + 1) * Lk], zf)
            dkc = blk_k if dkc is None else dkc + blk_k
            dvc = blk_v if dvc is None else dvc + blk_v
        dck_ref[0, 0] = dkc[:1].astype(dck_ref.dtype)
        dk_ref[0, 0] = dkc[1:].astype(dk_ref.dtype)
        dcv_ref[0, 0] = dvc[:1].astype(dcv_ref.dtype)
        dv_ref[0, 0] = dvc[1:].astype(dv_ref.dtype)

    return kernel


def _space_bsd_specs(L, lb):
    blk = pl.BlockSpec((1, 1, L, lb), lambda b, h, g: (b, g, 0, h),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, lb), lambda b, h, g: (b, 0, h),
                       memory_space=pltpu.VMEM)
    return blk, cls


# --------------------------------------------------------------------------
# GSPMD partitioning for the BSD kernels
# --------------------------------------------------------------------------
#
# ``pallas_call`` lowers to an opaque custom call the SPMD partitioner
# cannot split, so without help a dp/tp mesh either fails to partition or
# silently replicates every attention site.  Each BSD kernel program is
# embarrassingly parallel over (batch, lane-slice, group): wrapping the
# fwd/bwd pallas calls in ``jax.experimental.custom_partitioning`` with an
# einsum-style Shardy rule lets GSPMD shard them like any other batched op:
#
#   * batch dim        -> data parallelism (the production dp mesh);
#   * minor (D) dim    -> head/tensor parallelism, accepted only when the
#     local D still head- and lane-aligns (validated in `_mk_partition`);
#   * group dim        -> sequence parallelism (frames for the space
#     kernel, patch columns for the time forward; the time BACKWARD needs
#     n replicated because its CLS gradients are reduced over n in-kernel).
#
# Attention lengths (space L, time f) are `need_replication` factors.  The
# per-shard lowering is the plain local pallas call on shard shapes; no
# collectives are needed inside the op.  Head width ``hd`` is threaded
# explicitly (NOT derived from the possibly-sharded local D).


def _dim_shards(mesh, entry) -> int:
    if entry is None:
        return 1
    axes = entry if isinstance(entry, tuple) else (entry,)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def _mk_partition(hd: int, local_fn, arg_dims, out_dims):
    """custom_partitioning `partition` callback: canonicalize every
    operand/result sharding from q's (batch, group, minor) specs.  Dim
    roles: 'b' batch, 'g' group (shardable), 'l' attended length
    (replicated), 'u' unit dim (replicated), 'd' minor/feature dim
    (sharded only when the local slice stays head- and lane-aligned)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def partition(mesh, arg_shapes, result_shape):
        q = arg_shapes[0]
        spec = q.sharding.spec
        roles = {"l": None, "u": None}
        for i, r in enumerate(arg_dims[0]):
            if r not in roles:
                roles[r] = spec[i] if i < len(spec) else None
        d_spec = roles.get("d")
        if d_spec is not None:
            D = q.shape[-1]
            shards = _dim_shards(mesh, d_spec)
            Dl = D // shards if D % shards == 0 else 0
            ok = (Dl > 0 and Dl % hd == 0
                  and (Dl % LANE != 0 or LANE % hd == 0))
            if not ok:
                roles["d"] = None

        def sh(dims):
            return NamedSharding(mesh, P(*(roles.get(r) for r in dims)))

        arg_sh = tuple(sh(d) for d in arg_dims)
        if isinstance(result_shape, (tuple, list)):
            res_sh = tuple(sh(d) for d in out_dims)
        else:
            res_sh = sh(out_dims[0])
        return mesh, local_fn, res_sh, arg_sh

    return partition


def _space_fwd_bsd_call(q, k, v, cls_k, cls_v, *, hd, scale):
    B, G, L, D = q.shape
    lb = _lane_block(D, hd)
    blk, cls = _space_bsd_specs(L, lb)
    return pl.pallas_call(
        _space_fwd_body(scale, hd, lb // hd),
        grid=(B, D // lb, G),
        in_specs=[blk, blk, blk, cls, cls],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, G, L, D), q.dtype),
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v)


def _space_bwd_bsd_call(q, k, v, cls_k, cls_v, do, *, hd, scale):
    B, G, L, D = q.shape
    lb = _lane_block(D, hd)
    blk, cls = _space_bsd_specs(L, lb)
    cls_out = pl.BlockSpec((1, 1, 1, lb), lambda b, h, g: (b, g, 0, h),
                           memory_space=pltpu.VMEM)
    shapes = (
        jax.ShapeDtypeStruct((B, G, L, D), q.dtype),
        jax.ShapeDtypeStruct((B, G, L, D), q.dtype),
        jax.ShapeDtypeStruct((B, G, L, D), q.dtype),
        jax.ShapeDtypeStruct((B, G, 1, D), q.dtype),   # dck per group
        jax.ShapeDtypeStruct((B, G, 1, D), q.dtype),   # dcv per group
    )
    return pl.pallas_call(
        _space_bwd_body(scale, hd, lb // hd),
        grid=(B, D // lb, G),
        in_specs=[blk, blk, blk, cls, cls, blk],
        out_specs=(blk, blk, blk, cls_out, cls_out),
        out_shape=shapes,
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v, do)


import functools as _ft


@_ft.lru_cache(maxsize=None)
def _space_bsd_ops(hd: int, scale: float):
    """(fwd, bwd) space-kernel callables partitioned for GSPMD meshes."""
    from jax.experimental.custom_partitioning import custom_partitioning

    def fwd_fn(q, k, v, ck, cv):
        return _space_fwd_bsd_call(q, k, v, ck, cv, hd=hd, scale=scale)

    blk4, cls3, cls4 = ("b", "g", "l", "d"), ("b", "u", "d"), ("b", "g", "u", "d")
    fwd = custom_partitioning(fwd_fn)
    fwd.def_partition(
        _mk_partition(hd, fwd_fn, (blk4,) * 3 + (cls3,) * 2, (blk4,)),
        sharding_rule="b g l d, b g l d, b g l d, b u d, b u d -> b g l d",
        need_replication_factors=("l", "u"),
    )

    def bwd_fn(q, k, v, ck, cv, do):
        return _space_bwd_bsd_call(q, k, v, ck, cv, do, hd=hd, scale=scale)

    bwd = custom_partitioning(bwd_fn)
    bwd.def_partition(
        _mk_partition(hd, bwd_fn, (blk4,) * 3 + (cls3,) * 2 + (blk4,),
                      (blk4,) * 3 + (cls4,) * 2),
        sharding_rule=("b g l d, b g l d, b g l d, b u d, b u d, b g l d"
                       " -> b g l d, b g l d, b g l d, b g u d, b g u d"),
        need_replication_factors=("l", "u"),
    )
    return fwd, bwd


def make_space_attention_bsd(heads: int, scale: float):
    @jax.custom_vjp
    def fn(q, k, v, cls_k, cls_v):
        hd = q.shape[-1] // heads
        return _space_bsd_ops(hd, scale)[0](q, k, v, cls_k, cls_v)

    def fwd(q, k, v, cls_k, cls_v):
        return fn(q, k, v, cls_k, cls_v), (q, k, v, cls_k, cls_v)

    def bwd(res, do):
        q, k, v, cls_k, cls_v = res
        hd = q.shape[-1] // heads
        dq, dk, dv, dck_g, dcv_g = _space_bsd_ops(hd, scale)[1](
            q, k, v, cls_k, cls_v, do)
        # CLS k/v are shared across groups -> sum their per-group grads
        # (outside the partitioned op: under a group-sharded mesh GSPMD
        # turns this into the reduce over shards)
        return dq, dk, dv, jnp.sum(dck_g, axis=1), jnp.sum(dcv_g, axis=1)

    fn.defvjp(fwd, bwd)
    return fn


def _time_fwd_body(scale, hd, hpb):
    mk = {"v1": _mk_time_fwd_bsd, "v2": _mk_time_fwd_bsd_v2,
          "v3": _mk_time_fwd_bsd_v3, "v3b": _mk_time_fwd_bsd_v3,
          }[_time_kernel_variant()]
    return mk(scale, hd, hpb)


def _time_bwd_body(scale, hd, hpb):
    var = _time_kernel_variant()
    if var == "v3b":
        return _mk_time_bwd_bsd_v3(scale, hd, hpb, force_batched=True)
    mk = {"v1": _mk_time_bwd_bsd, "v2": _mk_time_bwd_bsd_v2,
          "v3": _mk_time_bwd_bsd_v3}[var]
    return mk(scale, hd, hpb)


def _mk_time_fwd_bsd(scale, hd, hpb):
    # fi-BATCHED formulation: all f destination rows of one head are
    # processed as a single [f*nb, hd] tile, with k/v tiled per source
    # frame.  vs the per-(fi, g) loop this launches ~f x fewer VPU ops on
    # proportionally larger tiles — measured 2.9x faster at f=16 and at
    # parity for f=4 (scan-amortized on v5e).  Live f32 temporaries scale
    # ~O(f*nb*hd) instead of the old unrolled f*(f+1) stack, so larger
    # n-blocks fit scoped VMEM (the compile probe re-verifies per device).
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        f, nb = q_ref.shape[1], q_ref.shape[2]
        for hp in range(hpb):
            c = slice(hp * hd, (hp + 1) * hd)
            qa = q_ref[0, :, :, c].reshape(f * nb, hd).astype(
                jnp.float32) * scale
            ck = ck_ref[0, :, c].astype(jnp.float32)   # [1, hd]
            cols = [jnp.sum(qa * ck, axis=-1, keepdims=True)]
            for g in range(f):
                kg = k_ref[0, g, :, c].astype(jnp.float32)
                cols.append(jnp.sum(qa * jnp.concatenate([kg] * f, axis=0),
                                    axis=-1, keepdims=True))
            logits = jnp.concatenate(cols, axis=1)      # [f*nb, f+1]
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            out = p[:, :1] * jnp.broadcast_to(
                cv_ref[0, :, c].astype(jnp.float32), (f * nb, hd))
            for g in range(f):
                vg = v_ref[0, g, :, c].astype(jnp.float32)
                out = out + p[:, g + 1:g + 2] * \
                    jnp.concatenate([vg] * f, axis=0)
            o_ref[0, :, :, c] = out.reshape(f, nb, hd).astype(o_ref.dtype)

    return kernel


def _time_kernel_variant() -> str:
    """'v2' (default) = MXU-segmented bodies; 'v1' = the r2/r3 fi-batched
    VPU bodies (EGOVLP_TIME_KERNEL overrides; consulted at trace time)."""
    import os

    var = os.environ.get("EGOVLP_TIME_KERNEL", "v2")
    if var not in ("v1", "v2", "v3", "v3b"):
        raise ValueError(
            f"EGOVLP_TIME_KERNEL={var!r}: expected one of v1/v2/v3/v3b")
    return var


def _seg_mats(f, lb, hd, hpb):
    """Head-segment matrices for the v2 bodies.

    ``seg [lb, hpb]``: lane l belongs to head l // hd.  Right-multiplying
    an elementwise q*k product tile by ``seg`` performs the per-head
    d-contraction ON THE MXU — replacing the v1 bodies' per-head LANE
    reductions (log2(hd) shuffle passes on half-empty 64-lane tiles),
    which dominated their runtime.  ``seg.T`` broadcasts per-head scalars
    back across that head's lanes; ``sel [(f+1)*hpb, hpb]`` sums the
    (g-major, head-minor) logit columns per head.
    """
    li = jax.lax.broadcasted_iota(jnp.int32, (lb, hpb), 0) // hd
    hi = jax.lax.broadcasted_iota(jnp.int32, (lb, hpb), 1)
    seg = (li == hi).astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, ((f + 1) * hpb, hpb), 0) % hpb
    hj = jax.lax.broadcasted_iota(jnp.int32, ((f + 1) * hpb, hpb), 1)
    sel = (ci == hj).astype(jnp.float32)
    return seg, sel


def _mk_time_fwd_bsd_v2(scale, hd, hpb):
    # MXU-segmented formulation: the whole 128-lane block (hpb heads) is
    # processed at once; per-head q.k contractions are one skinny matmul
    # against the block-diagonal `seg` (see _seg_mats) instead of v1's
    # per-head lane reductions; softmax uses ONE shared row max (>= every
    # per-head max, so equally stable) and defers the normalisation to a
    # single divide after the value accumulation.  At f <= 8 the forward
    # further batches all per-frame matmuls into one MXU pass (the v3
    # body) — same-session A/B: 4f fwd 0.795 vs 0.931 ms/block; at f=16
    # the v3 stacks thrash VMEM (fwd+bwd 10.2 vs 8.1) so the per-g loop
    # stays.  Measured on v5e (scripts/time_kernel_ab.py), docs/ROUND4.md.
    v3 = _mk_time_fwd_bsd_v3(scale, hd, hpb)

    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        f, nb, lb = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
        if f <= 8:
            v3(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref)
            return
        seg, sel = _seg_mats(f, lb, hd, hpb)
        qa = q_ref[0].astype(jnp.float32) * scale          # [f, nb, lb]
        ck = ck_ref[0].astype(jnp.float32)                 # [1, lb]

        def seg_sum(prod3):  # [f, nb, lb] -> per-head sums [f*nb, hpb]
            return jnp.dot(prod3.reshape(f * nb, lb), seg,
                           preferred_element_type=jnp.float32)

        def lanes(cols2):    # [f*nb, hpb] -> per-head lane broadcast
            return jnp.dot(cols2, seg.T,
                           preferred_element_type=jnp.float32)

        cols = [seg_sum(qa * ck[None])]                    # CLS column first
        for g in range(f):
            cols.append(seg_sum(qa * k_ref[0, g][None].astype(jnp.float32)))
        e = jnp.concatenate(cols, axis=1)                  # [f*nb, (f+1)*hpb]
        e = jnp.exp(e - jnp.max(e, axis=1, keepdims=True))
        s_lanes = lanes(jnp.dot(e, sel,
                                preferred_element_type=jnp.float32))
        acc = lanes(e[:, :hpb]).reshape(f, nb, lb) \
            * cv_ref[0][None].astype(jnp.float32)
        for g in range(f):
            acc = acc + lanes(e[:, (g + 1) * hpb:(g + 2) * hpb]) \
                .reshape(f, nb, lb) * v_ref[0, g][None].astype(jnp.float32)
        o_ref[0] = (acc / s_lanes.reshape(f, nb, lb)).astype(o_ref.dtype)

    return kernel


def _mk_time_bwd_bsd_v2(scale, hd, hpb):
    # backward of the MXU-segmented formulation; same segment-matmul
    # tricks for dp/inner/dl, and the dk/dv cross-frame sums are cheap
    # axis-0 reductions on the [f, nb, lb] grid.  At f <= 8 the batched
    # v3 body wins (same-session v5e A/B at the 4f flagship shape:
    # 1.46 ms/block vs 2.6 for the per-(fi,g) small-f body and ~2.6 for
    # this per-g body); at f = 16 its [f+1, f, nb, lb] stacks thrash
    # VMEM (10.1 vs 8.1 ms fwd+bwd), so this per-g loop stays.
    v3 = _mk_time_bwd_bsd_v3(scale, hd, hpb, force_batched=True)

    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
               dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
        f, nb, lb = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
        if f <= 8:
            v3(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
               dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref)
            return
        seg, sel = _seg_mats(f, lb, hd, hpb)
        qa = q_ref[0].astype(jnp.float32) * scale
        do = do_ref[0].astype(jnp.float32)
        ck = ck_ref[0].astype(jnp.float32)
        cv = cv_ref[0].astype(jnp.float32)

        def seg_sum(prod3):
            return jnp.dot(prod3.reshape(f * nb, lb), seg,
                           preferred_element_type=jnp.float32)

        def lanes(cols2):
            return jnp.dot(cols2, seg.T,
                           preferred_element_type=jnp.float32)

        cols = [seg_sum(qa * ck[None])]
        dcols = [seg_sum(do * cv[None])]
        for g in range(f):
            cols.append(seg_sum(qa * k_ref[0, g][None].astype(jnp.float32)))
            dcols.append(seg_sum(do * v_ref[0, g][None].astype(jnp.float32)))
        lg = jnp.concatenate(cols, axis=1)                 # [f*nb, (f+1)*hpb]
        e = jnp.exp(lg - jnp.max(lg, axis=1, keepdims=True))
        s = jnp.dot(e, sel, preferred_element_type=jnp.float32)
        p = e / jnp.dot(s, sel.T, preferred_element_type=jnp.float32)
        dp = jnp.concatenate(dcols, axis=1)
        inner = jnp.dot(dp * p, sel, preferred_element_type=jnp.float32)
        dl = p * (dp - jnp.dot(inner, sel.T,
                               preferred_element_type=jnp.float32))

        dcl = lanes(dl[:, :hpb]).reshape(f, nb, lb)
        pcl = lanes(p[:, :hpb]).reshape(f, nb, lb)
        dq = dcl * ck[None]
        for g in range(f):
            dlg = lanes(dl[:, (g + 1) * hpb:(g + 2) * hpb]).reshape(f, nb, lb)
            pg = lanes(p[:, (g + 1) * hpb:(g + 2) * hpb]).reshape(f, nb, lb)
            dq = dq + dlg * k_ref[0, g][None].astype(jnp.float32)
            dk_ref[0, g] = jnp.sum(dlg * qa, axis=0).astype(dk_ref.dtype)
            dv_ref[0, g] = jnp.sum(pg * do, axis=0).astype(dv_ref.dtype)
        dck_ref[0, 0] = jnp.sum(dcl * qa, axis=(0, 1))[None, :].astype(
            dck_ref.dtype)
        dcv_ref[0, 0] = jnp.sum(pcl * do, axis=(0, 1))[None, :].astype(
            dcv_ref.dtype)
        dq_ref[0] = (dq * scale).astype(dq_ref.dtype)

    return kernel


def _mk_time_fwd_bsd_v3(scale, hd, hpb):
    # v2 with the per-frame skinny matmuls BATCHED: all f+1 q*k product
    # tiles are stacked and contracted against `seg` in ONE MXU pass, and
    # all softmax lane-broadcasts come back in ONE pass against `seg.T` —
    # v2's 2f+4 small matmuls each pay MXU pipeline fill, which dominates
    # at these tile sizes.  Softmax statistics reduce over axis 0 of the
    # [f+1, f*nb, hpb] logit stack (cheap strided vreg ops; per-head max).
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        f, nb, lb = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
        seg, _ = _seg_mats(f, lb, hd, hpb)
        qa = q_ref[0].astype(jnp.float32) * scale          # [f, nb, lb]
        ck = ck_ref[0].astype(jnp.float32)                 # [1, lb]
        prods = jnp.stack(
            [qa * ck[None]]
            + [qa * k_ref[0, g][None].astype(jnp.float32) for g in range(f)],
            axis=0)                                        # [f+1, f, nb, lb]
        lg = jnp.dot(prods.reshape((f + 1) * f * nb, lb), seg,
                     preferred_element_type=jnp.float32
                     ).reshape(f + 1, f * nb, hpb)
        e = jnp.exp(lg - jnp.max(lg, axis=0, keepdims=True))
        s = jnp.sum(e, axis=0)                             # [f*nb, hpb]
        wl = jnp.dot(e.reshape((f + 1) * f * nb, hpb), seg.T,
                     preferred_element_type=jnp.float32
                     ).reshape(f + 1, f, nb, lb)
        sl = jnp.dot(s, seg.T, preferred_element_type=jnp.float32
                     ).reshape(f, nb, lb)
        acc = wl[0] * cv_ref[0][None].astype(jnp.float32)
        for g in range(f):
            acc = acc + wl[g + 1] * v_ref[0, g][None].astype(jnp.float32)
        o_ref[0] = (acc / sl).astype(o_ref.dtype)

    return kernel


def _mk_time_bwd_bsd_v3(scale, hd, hpb, force_batched=False):
    # batched-matmul backward (see _mk_time_fwd_bsd_v3); keeps the
    # per-(fi,g) small-f body at f <= 4 like v2 (``force_batched`` is the
    # 'v3b' A/B knob that runs the batched body at small f too)
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
               dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
        f, nb, lb = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
        if f <= 4 and not force_batched:
            _time_bwd_small_f(scale, hd, hpb, q_ref, k_ref, v_ref, ck_ref,
                              cv_ref, do_ref, dq_ref, dk_ref, dv_ref,
                              dck_ref, dcv_ref)
            return
        seg, _ = _seg_mats(f, lb, hd, hpb)
        qa = q_ref[0].astype(jnp.float32) * scale
        do = do_ref[0].astype(jnp.float32)
        ck = ck_ref[0].astype(jnp.float32)
        cv = cv_ref[0].astype(jnp.float32)

        M = (f + 1) * f * nb
        prods = jnp.stack(
            [qa * ck[None]]
            + [qa * k_ref[0, g][None].astype(jnp.float32) for g in range(f)],
            axis=0)
        lg = jnp.dot(prods.reshape(M, lb), seg,
                     preferred_element_type=jnp.float32
                     ).reshape(f + 1, f * nb, hpb)
        dprods = jnp.stack(
            [do * cv[None]]
            + [do * v_ref[0, g][None].astype(jnp.float32) for g in range(f)],
            axis=0)
        dp = jnp.dot(dprods.reshape(M, lb), seg,
                     preferred_element_type=jnp.float32
                     ).reshape(f + 1, f * nb, hpb)
        e = jnp.exp(lg - jnp.max(lg, axis=0, keepdims=True))
        p = e / jnp.sum(e, axis=0, keepdims=True)
        dl = p * (dp - jnp.sum(dp * p, axis=0, keepdims=True))
        dll = jnp.dot(dl.reshape(M, hpb), seg.T,
                      preferred_element_type=jnp.float32
                      ).reshape(f + 1, f, nb, lb)
        pl = jnp.dot(p.reshape(M, hpb), seg.T,
                     preferred_element_type=jnp.float32
                     ).reshape(f + 1, f, nb, lb)
        dq = dll[0] * ck[None]
        for g in range(f):
            dq = dq + dll[g + 1] * k_ref[0, g][None].astype(jnp.float32)
            dk_ref[0, g] = jnp.sum(dll[g + 1] * qa, axis=0).astype(
                dk_ref.dtype)
            dv_ref[0, g] = jnp.sum(pl[g + 1] * do, axis=0).astype(
                dv_ref.dtype)
        dck_ref[0, 0] = jnp.sum(dll[0] * qa, axis=(0, 1))[None, :].astype(
            dck_ref.dtype)
        dcv_ref[0, 0] = jnp.sum(pl[0] * do, axis=(0, 1))[None, :].astype(
            dcv_ref.dtype)
        dq_ref[0] = (dq * scale).astype(dq_ref.dtype)

    return kernel


def _time_bwd_small_f(scale, hd, hpb, q_ref, k_ref, v_ref, ck_ref, cv_ref,
                      do_ref, dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
    """Per-(fi, g) time-attention backward — the fast body for small f.
    Gradients for k/v/cls accumulate directly into the output refs (zeroed
    up front) so no [f, n, hd] f32 accumulator lives in registers."""
    f = q_ref.shape[1]
    dk_ref[...] = jnp.zeros_like(dk_ref)
    dv_ref[...] = jnp.zeros_like(dv_ref)
    dck_ref[...] = jnp.zeros_like(dck_ref)
    dcv_ref[...] = jnp.zeros_like(dcv_ref)
    for hp in range(hpb):
        c = slice(hp * hd, (hp + 1) * hd)
        ck = ck_ref[0, :, c].astype(jnp.float32)
        cv = cv_ref[0, :, c].astype(jnp.float32)
        for fi in range(f):
            qf = q_ref[0, fi, :, c].astype(jnp.float32) * scale
            do = do_ref[0, fi, :, c].astype(jnp.float32)
            rows = [jnp.sum(qf * ck, axis=-1)]
            rows += [
                jnp.sum(qf * k_ref[0, g, :, c].astype(jnp.float32), axis=-1)
                for g in range(f)
            ]
            logits = jnp.stack(rows, axis=0)
            m = jnp.max(logits, axis=0, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=0, keepdims=True)
            dp = [jnp.sum(do * cv, axis=-1)]
            dp += [
                jnp.sum(do * v_ref[0, g, :, c].astype(jnp.float32), axis=-1)
                for g in range(f)
            ]
            dp = jnp.stack(dp, axis=0)
            inner = jnp.sum(dp * p, axis=0, keepdims=True)
            dl = p * (dp - inner)
            dq = dl[0][:, None] * ck
            dck_ref[0, 0, :, c] += jnp.sum(
                dl[0][:, None] * qf, axis=0, keepdims=True
            ).astype(dck_ref.dtype)
            dcv_ref[0, 0, :, c] += jnp.sum(
                p[0][:, None] * do, axis=0, keepdims=True
            ).astype(dcv_ref.dtype)
            for g in range(f):
                dq = dq + dl[g + 1][:, None] * \
                    k_ref[0, g, :, c].astype(jnp.float32)
                dk_ref[0, g, :, c] += (
                    dl[g + 1][:, None] * qf
                ).astype(dk_ref.dtype)
                dv_ref[0, g, :, c] += (
                    p[g + 1][:, None] * do
                ).astype(dv_ref.dtype)
            dq_ref[0, fi, :, c] = (dq * scale).astype(dq_ref.dtype)


def _mk_time_bwd_bsd(scale, hd, hpb):
    # Two trace-time bodies selected by frame count (measured, v5e,
    # scan-amortized fwd+bwd per block):
    #   f <= 4: per-(fi, g) loop with accumulating writes — 4.9 ms at the
    #           4f pretrain shape vs 6.4 ms for the batched body (the
    #           [f, nb, hd] sublane reductions don't pay off this small);
    #   f >= 8: fi-BATCHED — one [f*nb, hd] tile per head, dk/dv cross-row
    #           sums as sublane reductions; 2.9x faster at f=16.
    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
               dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref):
        f, nb = q_ref.shape[1], q_ref.shape[2]
        if f <= 4:
            _time_bwd_small_f(scale, hd, hpb, q_ref, k_ref, v_ref, ck_ref,
                              cv_ref, do_ref, dq_ref, dk_ref, dv_ref,
                              dck_ref, dcv_ref)
            return
        for hp in range(hpb):
            c = slice(hp * hd, (hp + 1) * hd)
            qa = q_ref[0, :, :, c].reshape(f * nb, hd).astype(
                jnp.float32) * scale
            do = do_ref[0, :, :, c].reshape(f * nb, hd).astype(jnp.float32)
            ck = ck_ref[0, :, c].astype(jnp.float32)   # [1, hd]
            cv = cv_ref[0, :, c].astype(jnp.float32)

            cols = [jnp.sum(qa * ck, axis=-1, keepdims=True)]
            dcols = [jnp.sum(do * cv, axis=-1, keepdims=True)]
            for g in range(f):
                kg = k_ref[0, g, :, c].astype(jnp.float32)
                vg = v_ref[0, g, :, c].astype(jnp.float32)
                cols.append(jnp.sum(qa * jnp.concatenate([kg] * f, axis=0),
                                    axis=-1, keepdims=True))
                dcols.append(jnp.sum(do * jnp.concatenate([vg] * f, axis=0),
                                     axis=-1, keepdims=True))
            logits = jnp.concatenate(cols, axis=1)      # [f*nb, f+1]
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            dp = jnp.concatenate(dcols, axis=1)
            inner = jnp.sum(dp * p, axis=1, keepdims=True)
            dl = p * (dp - inner)

            dq = dl[:, :1] * ck
            for g in range(f):
                kg = k_ref[0, g, :, c].astype(jnp.float32)
                dq = dq + dl[:, g + 1:g + 2] * \
                    jnp.concatenate([kg] * f, axis=0)
                dk_ref[0, g, :, c] = jnp.sum(
                    (dl[:, g + 1:g + 2] * qa).reshape(f, nb, hd), axis=0
                ).astype(dk_ref.dtype)
                dv_ref[0, g, :, c] = jnp.sum(
                    (p[:, g + 1:g + 2] * do).reshape(f, nb, hd), axis=0
                ).astype(dv_ref.dtype)
            dck_ref[0, 0, :, c] = jnp.sum(
                dl[:, :1] * qa, axis=0, keepdims=True).astype(dck_ref.dtype)
            dcv_ref[0, 0, :, c] = jnp.sum(
                p[:, :1] * do, axis=0, keepdims=True).astype(dcv_ref.dtype)
            dq_ref[0, :, :, c] = (dq * scale).reshape(f, nb, hd).astype(
                dq_ref.dtype)

    return kernel


def _time_bsd_specs(f, nb, lb):
    """Blocks are one (batch, lane-slice, n-block) tile: time attention is
    independent per patch column, so the n axis blocks freely."""
    blk = pl.BlockSpec((1, f, nb, lb), lambda b, h, j: (b, 0, j, h),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, lb), lambda b, h, j: (b, 0, h),
                       memory_space=pltpu.VMEM)
    return blk, cls


def _analytic_time_n_block(f: int, n: int, lb: int) -> int:
    """Prior for the fi-batched kernels: largest n-block (multiple of 8, or
    full n) expected to keep the kernel within the 16 MB scoped-VMEM limit.

    Two VMEM terms both scale with nb: the 11 double-buffered bf16 ref
    blocks (11 * f * nb * lb * 2 * 2 bytes — at f=16 full-n these alone
    are ~17.6 MB) and the live f32 temporaries of the fi-batched kernel
    ([f*nb, hd] q/do/out tiles, per-g tiled k/v, [f*nb, f+1] probability
    tensors: ~(6*hd + 3*(f+1)) * f * nb * 4 with hd = lb/2 typical).  On
    other TPU generations / Mosaic versions this is only the STARTING
    candidate — `time_n_block` verifies it with a compile probe,
    shrinking on failure and growing while it keeps fitting."""
    hd = max(lb // 2, 64)

    def vmem(nb):
        refs = 11 * f * nb * lb * 2 * 2
        temps = (6 * hd + 3 * (f + 1)) * f * nb * 4
        return refs + temps

    if vmem(n) <= int(12 * 2 ** 20):
        return n
    nb = 8
    while nb + 8 < n and vmem(nb + 8) <= int(10 * 2 ** 20):
        nb += 8
    return nb


_NB_CACHE: dict = {}


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


def _nb_cache_file():
    import os
    import pathlib

    root = os.environ.get("EGOVLP_CACHE_DIR",
                          os.path.expanduser("~/.cache/egovlp_tpu"))
    return pathlib.Path(root) / "time_nb_cache.json"


def _nb_disk_get(key: str):
    import json

    try:
        return json.loads(_nb_cache_file().read_text()).get(key)
    except Exception:
        return None


def _nb_disk_put(key: str, nb: int) -> None:
    import json

    try:
        path = _nb_cache_file()
        path.parent.mkdir(parents=True, exist_ok=True)
        data = {}
        if path.exists():
            data = json.loads(path.read_text())
        data[key] = nb
        path.write_text(json.dumps(data, indent=1, sort_keys=True))
    except Exception:
        pass  # best-effort: cache misses just re-probe


def _time_kernel_compiles(f: int, nb: int, lb: int, hd: int,
                          multi_j: bool = True,
                          dtype=jnp.bfloat16) -> bool:
    """Compile-probe one lane-slice / one n-block of the time kernels
    (fwd + bwd) on the current backend.

    The probe grid MUST match the real launch's pipelining: under a
    single-step grid Mosaic skips the DMA double buffers, so a
    (1, 1, 1)-grid probe under-counts scoped VMEM by one full set of
    block buffers and admits n-blocks that OOM in production (found the
    hard way: f=8 nb=120 probed green but the real backward died 880 KB
    over the 16 MB scoped-vmem limit).  ``multi_j`` mirrors whether the
    candidate leaves more than one n-block in the real grid; when the
    block covers all of n (j-grid = 1, e.g. the f=4 flagship shape) the
    real launch pipelines only over lanes, and probing with a doubled j
    axis would spuriously reject it."""
    scale = float(hd) ** -0.5
    hpb = lb // hd
    blk, cls = _time_bsd_specs(f, nb, lb)
    cls_out = pl.BlockSpec((1, 1, 1, lb), lambda b, h, j: (b, j, 0, h),
                           memory_space=pltpu.VMEM)
    nj = 2 if multi_j else 1
    grid = (1, 2, nj)
    q = jax.ShapeDtypeStruct((1, f, nj * nb, 2 * lb), dtype)
    c = jax.ShapeDtypeStruct((1, 1, 2 * lb), dtype)

    def fwd(q_, k_, v_, ck_, cv_):
        return pl.pallas_call(
            _time_fwd_body(scale, hd, hpb), grid=grid,
            in_specs=[blk, blk, blk, cls, cls], out_specs=blk,
            out_shape=jax.ShapeDtypeStruct(q.shape, dtype),
        )(q_, k_, v_, ck_, cv_)

    def bwd(q_, k_, v_, ck_, cv_, do_):
        return pl.pallas_call(
            _time_bwd_body(scale, hd, hpb), grid=grid,
            in_specs=[blk, blk, blk, cls, cls, blk],
            out_specs=(blk, blk, blk, cls_out, cls_out),
            out_shape=(
                jax.ShapeDtypeStruct(q.shape, dtype),
                jax.ShapeDtypeStruct(q.shape, dtype),
                jax.ShapeDtypeStruct(q.shape, dtype),
                jax.ShapeDtypeStruct((1, nj, 1, 2 * lb), dtype),
                jax.ShapeDtypeStruct((1, nj, 1, 2 * lb), dtype),
            ),
        )(q_, k_, v_, ck_, cv_, do_)

    try:
        jax.jit(fwd).lower(q, q, q, c, c).compile()
        jax.jit(bwd).lower(q, q, q, c, c, q).compile()
        return True
    except Exception:
        return False


def time_n_block(f: int, n: int, lb: int, itemsize: int = 2,
                 hd: int | None = None) -> int:
    """n-block size for the time kernels, valid on the CURRENT backend.

    Starts from the v5e-calibrated analytic prior and, when ``hd`` is given
    and we are on a real TPU, verifies it with a compile probe — shrinking
    to the next multiple of 8 on scoped-VMEM failure — so block selection
    ports to other TPU generations / Mosaic versions without editing
    constants.  Results are cached in-process and on disk (keyed by device
    kind + jax version); EGOVLP_TIME_NB overrides everything."""
    import os

    env = os.environ.get("EGOVLP_TIME_NB")
    if env:
        return int(env)

    # variant in the key: a process that flips EGOVLP_TIME_KERNEL between
    # traces must not reuse an nb probed for the other body's VMEM shape
    variant = _time_kernel_variant()
    key = (variant, f, n, lb)
    if key in _NB_CACHE:
        return _NB_CACHE[key]
    # the kernel re-queries with the call site's PADDED n (ceil to nb);
    # reuse the unpadded entry's choice so both sides always agree
    for (kvar, kf, kn, klb), nb in _NB_CACHE.items():
        if kvar == variant and kf == f and klb == lb \
                and -(-kn // nb) * nb == n:
            _NB_CACHE[key] = nb
            return nb

    # kv4: the probe reproduces the real launch's DMA double-buffering
    # (kv2's single-step-grid probes admitted nb values that OOM'd scoped
    # VMEM in production) and the result is pad-balanced — versioning
    # invalidates stale cached sizes
    disk_key = (f"{_device_kind()}|jax{jax.__version__}|kv5{variant}|f{f}|n{n}|lb{lb}")
    cached = _nb_disk_get(disk_key)
    if cached is not None:
        _NB_CACHE[key] = int(cached)
        return int(cached)

    nb = _analytic_time_n_block(f, n, lb)
    if hd is not None and not _use_interpret():
        probe = lambda cand: _time_kernel_compiles(f, cand, lb, hd,
                                                   multi_j=cand < n)
        fail_floor = None  # smallest candidate known to fail
        while not probe(nb):
            if nb <= 8:
                raise RuntimeError(
                    f"time-attention kernel does not fit scoped VMEM on "
                    f"{_device_kind()} even at n-block 8 (f={f}, lb={lb}); "
                    "use attention_impl='xla' for this configuration"
                )
            fail_floor = nb
            nb = max(8, nb // 2 // 8 * 8)  # halve: O(log) probes down
        if fail_floor is None and nb < n:
            # the prior fit first try: grow while it keeps fitting (larger
            # blocks amortise grid/launch overhead), capped at full n
            grown = nb
            while grown < n:
                cand = min(n, grown * 2)  # doubles stay multiples of 8
                if not probe(cand):
                    fail_floor = cand
                    break
                grown = cand
            nb = grown
        if fail_floor is not None:
            # binary-search the largest fitting multiple of 8 in
            # (nb, fail_floor) — halving/doubling overshoots by up to 2x
            lo, hi = nb, fail_floor
            while hi - lo > 8:
                mid = (lo + hi) // 2 // 8 * 8
                if mid <= lo or mid >= hi:
                    break
                if probe(mid):
                    lo = mid
                else:
                    hi = mid
            nb = lo
        if nb < n:
            # balance: the same number of n-blocks with the smallest
            # (multiple-of-8) block minimises pad columns — e.g. f=8's
            # largest fitting block 96 would pad 196 -> 288, the balanced
            # 72 pads only to 216 (same three blocks, 25% less work)
            blocks = -(-n // nb)
            nb = -(-(-(-n // blocks)) // 8) * 8
        _nb_disk_put(disk_key, nb)
    _NB_CACHE[key] = nb
    return nb


def _pad_n(t, n_pad, n):
    if n_pad == n:
        return t
    return jnp.pad(t, [(0, 0), (0, 0), (0, n_pad - n), (0, 0)])


def _time_fwd_bsd_call(q, k, v, cls_k, cls_v, *, hd, scale):
    """Local time-attention forward on any n: pads patch columns to the
    probed n-block (zero columns yield uniform finite softmax rows and are
    sliced away)."""
    B, f, n, D = q.shape
    lb = _lane_block(D, hd)
    nb = time_n_block(f, n, lb, hd=hd)
    n_pad = -(-n // nb) * nb
    q, k, v = (_pad_n(t, n_pad, n) for t in (q, k, v))
    blk, cls = _time_bsd_specs(f, nb, lb)
    out = pl.pallas_call(
        _time_fwd_body(scale, hd, lb // hd),
        grid=(B, D // lb, n_pad // nb),
        in_specs=[blk, blk, blk, cls, cls],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, f, n_pad, D), q.dtype),
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v)
    return out[:, :, :n] if n_pad != n else out


def _time_bwd_bsd_call(q, k, v, cls_k, cls_v, do, *, hd, scale):
    """Local time-attention backward; returns (dq, dk, dv, dck [B,1,D],
    dcv [B,1,D]) with the CLS grads already reduced over the n-blocks (pad
    columns have zero q/k/v/do, so they contribute exact zeros)."""
    B, f, n, D = q.shape
    lb = _lane_block(D, hd)
    nb = time_n_block(f, n, lb, hd=hd)
    n_pad = -(-n // nb) * nb
    q, k, v, do = (_pad_n(t, n_pad, n) for t in (q, k, v, do))
    blk, cls = _time_bsd_specs(f, nb, lb)
    cls_out = pl.BlockSpec((1, 1, 1, lb), lambda b, h, j: (b, j, 0, h),
                           memory_space=pltpu.VMEM)
    shapes = (
        jax.ShapeDtypeStruct((B, f, n_pad, D), q.dtype),
        jax.ShapeDtypeStruct((B, f, n_pad, D), q.dtype),
        jax.ShapeDtypeStruct((B, f, n_pad, D), q.dtype),
        jax.ShapeDtypeStruct((B, n_pad // nb, 1, D), q.dtype),  # per n-block
        jax.ShapeDtypeStruct((B, n_pad // nb, 1, D), q.dtype),
    )
    dq, dk, dv, dck_j, dcv_j = pl.pallas_call(
        _time_bwd_body(scale, hd, lb // hd),
        grid=(B, D // lb, n_pad // nb),
        in_specs=[blk, blk, blk, cls, cls, blk],
        out_specs=(blk, blk, blk, cls_out, cls_out),
        out_shape=shapes,
        interpret=_use_interpret(),
    )(q, k, v, cls_k, cls_v, do)
    if n_pad != n:
        dq, dk, dv = (t[:, :, :n] for t in (dq, dk, dv))
    return dq, dk, dv, jnp.sum(dck_j, axis=1), jnp.sum(dcv_j, axis=1)


@_ft.lru_cache(maxsize=None)
def _time_bsd_ops(hd: int, scale: float):
    """(fwd, bwd) time-kernel callables partitioned for GSPMD meshes.

    The forward shards over (batch, patch columns, lanes); the backward
    only over (batch, lanes) — its CLS gradients are reduced over n inside
    the local call, so n must be whole per shard (a mixed passthrough/
    reduction factor is not expressible in one Shardy rule).  Under
    n-sharded sequence parallelism GSPMD therefore gathers n for the
    backward pass only."""
    from jax.experimental.custom_partitioning import custom_partitioning

    def fwd_fn(q, k, v, ck, cv):
        return _time_fwd_bsd_call(q, k, v, ck, cv, hd=hd, scale=scale)

    blk4, cls3 = ("b", "f", "n", "d"), ("b", "u", "d")
    fwd = custom_partitioning(fwd_fn)
    fwd.def_partition(
        _mk_partition(hd, fwd_fn, (blk4,) * 3 + (cls3,) * 2, (blk4,)),
        sharding_rule="b f n d, b f n d, b f n d, b u d, b u d -> b f n d",
        need_replication_factors=("f", "u"),
    )

    def bwd_fn(q, k, v, ck, cv, do):
        return _time_bwd_bsd_call(q, k, v, ck, cv, do, hd=hd, scale=scale)

    bwd_blk = ("b", "f", "n", "d")
    bwd = custom_partitioning(bwd_fn)
    bwd.def_partition(
        _mk_partition(hd, bwd_fn, (bwd_blk,) * 3 + (cls3,) * 2 + (bwd_blk,),
                      (bwd_blk,) * 3 + (cls3,) * 2),
        sharding_rule=("b f n d, b f n d, b f n d, b u d, b u d, b f n d"
                       " -> b f n d, b f n d, b f n d, b u d, b u d"),
        # note: special factors must be listed in first-appearance order
        # (the Shardy verifier requires their indices sorted)
        need_replication_factors=("f", "n", "u"),
    )
    return fwd, bwd


def make_time_attention_bsd(heads: int, scale: float):
    @jax.custom_vjp
    def fn(q, k, v, cls_k, cls_v):
        hd = q.shape[-1] // heads
        return _time_bsd_ops(hd, scale)[0](q, k, v, cls_k, cls_v)

    def fwd(q, k, v, cls_k, cls_v):
        return fn(q, k, v, cls_k, cls_v), (q, k, v, cls_k, cls_v)

    def bwd(res, do):
        q, k, v, cls_k, cls_v = res
        hd = q.shape[-1] // heads
        return _time_bsd_ops(hd, scale)[1](q, k, v, cls_k, cls_v, do)

    fn.defvjp(fwd, bwd)
    return fn
