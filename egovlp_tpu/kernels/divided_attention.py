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

The grouped attention is a batched small-matrix softmax-attention: XLA maps
it onto the MXU as batched matmuls of shape [L, hd] x [hd, L+1] with
L = patches (197-ish) or frames (4..16).  Softmax statistics accumulate in
float32 regardless of the input dtype.

This module is the single source of truth for the op; the Flax towers call
``divided_attention`` and the Pallas fused kernel
(`egovlp_tpu.kernels.pallas_attention`) is selected via ``impl=`` once the
shapes are big enough to pay off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softmax_f32(logits: jax.Array) -> jax.Array:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def divided_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    frames: int,
    patches: int,
    axis: str,
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

    Returns:
      ``[B, H, S, hd]`` attention output (pre output-projection).
    """
    if axis not in ("space", "time"):
        raise ValueError(f"axis must be 'space' or 'time', got {axis!r}")
    B, H, S, hd = q.shape
    assert S == 1 + frames * patches, (S, frames, patches)
    dtype = q.dtype

    cls_q = q[:, :, :1]  # [B, H, 1, hd]
    cls_k = k[:, :, :1]
    cls_v = v[:, :, :1]

    # --- CLS row: full attention over all S tokens.
    cls_logits = jnp.einsum(
        "bhqd,bhkd->bhqk", cls_q, k, preferred_element_type=jnp.float32
    )
    cls_probs = _softmax_f32(cls_logits).astype(dtype)
    cls_out = jnp.einsum("bhqk,bhkd->bhqd", cls_probs, v)  # [B,H,1,hd]

    # --- Patch tokens: grouped attention with CLS k/v spliced in front.
    def group(t):
        t = t[:, :, 1:].reshape(B, H, frames, patches, hd)
        if axis == "time":
            t = jnp.swapaxes(t, 2, 3)  # [B,H,n,f,hd]
        return t  # [B,H,G,L,hd]

    qg, kg, vg = group(q), group(k), group(v)

    grp_logits = jnp.einsum(
        "bhgqd,bhgkd->bhgqk", qg, kg, preferred_element_type=jnp.float32
    )  # [B,H,G,L,L]
    cls_col = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qg, cls_k, preferred_element_type=jnp.float32
    )  # [B,H,G,L,1]
    probs = _softmax_f32(jnp.concatenate([cls_col, grp_logits], axis=-1))
    probs = probs.astype(dtype)

    out_g = jnp.einsum("bhgqk,bhgkd->bhgqd", probs[..., 1:], vg)
    out_g = out_g + probs[..., :1] * cls_v[:, :, None]  # broadcast CLS value

    if axis == "time":
        out_g = jnp.swapaxes(out_g, 2, 3)
    out_patches = out_g.reshape(B, H, frames * patches, hd)

    return jnp.concatenate([cls_out, out_patches], axis=2)
