"""On-device video transforms (batched, jitted, TPU-layout-aware).

The reference runs torchvision video transforms on CPU dataloader workers
(/root/reference/data_loader/transforms.py:34-62): train =
RandomResizedCropVideo(224, scale=(0.5, 1)) + RandomHorizontalFlipVideo +
ColorJitter(0,0,0) (a no-op) + ImageNet normalize; eval = Resize(256) ->
CenterCrop(256) -> Resize(224) -> normalize.

TPU-native split (BASELINE.md north star): the host decoder emits fixed
``[T, pre, pre, 3]`` uint8 frames (short-side resize + center crop to
``pre`` = 256, done during decode); everything after raw RGB runs on-device
as one fused XLA program over the whole batch.

Layout: TPU tiles the last tensor dimension onto 128 vector lanes, so a
channels-last ``[..., W, 3]`` tensor pads 3 -> 128 lanes (~40x wasted
bandwidth; measured ~600 ms/step for the aug).  All device-side image math
therefore runs on the channel-FOLDED layout ``[B, T, H, W*3]`` (minor dim
768) and resizes are interpolation-matrix matmuls:

  * vertical:   ``Wy [out, H]`` contracted over H (minor dim stays W*3);
  * horizontal: ``kron(Wx, I3) [W*3, out*3]`` — one MXU matmul that
    resamples W while leaving the interleaved channels intact;
  * horizontal flip folds into ``Wx`` by reversing its columns — zero cost;
  * normalization uses a ``[out*3]`` tiled mean/std vector.

The measured cost on v5e is ~2 ms/step vs ~600 ms for the naive
channels-last gather formulation.  ``fold_channels`` / ``unfold_channels``
convert at the boundary (both are free reshapes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def fold_channels(frames: jax.Array) -> jax.Array:
    """[..., H, W, C] -> [..., H, W*C] (free reshape)."""
    *lead, H, W, C = frames.shape
    return frames.reshape(*lead, H, W * C)


def unfold_channels(frames: jax.Array, channels: int = 3) -> jax.Array:
    *lead, H, WC = frames.shape
    return frames.reshape(*lead, H, WC // channels, channels)


def normalize_folded(x: jax.Array, width: int) -> jax.Array:
    """ImageNet-normalize a channel-folded [..., W*3] float tensor."""
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN, x.dtype), width)
    std = jnp.tile(jnp.asarray(IMAGENET_STD, x.dtype), width)
    return (x - mean) / std


def normalize(frames: jax.Array) -> jax.Array:
    """Channels-last [..., 3] normalize (kept for API parity/tests)."""
    mean = jnp.asarray(IMAGENET_MEAN, frames.dtype)
    std = jnp.asarray(IMAGENET_STD, frames.dtype)
    return (frames - mean) / std


def _to_float(frames: jax.Array) -> jax.Array:
    if frames.dtype == jnp.uint8:
        return frames.astype(jnp.float32) / 255.0
    return frames.astype(jnp.float32)


def _interp_weights(src_size: int, out_size: int, start, length):
    """[out, src] bilinear (align_corners=False) interpolation matrix for
    the window [start, start+length) of a src_size axis."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = start + (i + 0.5) * (length / out_size) - 0.5
    src = jnp.clip(src, 0.0, src_size - 1.0)
    lo = jnp.floor(src)
    w_hi = src - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, src_size - 1)
    hi_i = jnp.clip(lo_i + 1, 0, src_size - 1)
    j = jnp.arange(src_size, dtype=jnp.int32)[None, :]
    return (
        (j == lo_i[:, None]) * (1.0 - w_hi[:, None])
        + (j == hi_i[:, None]) * w_hi[:, None]
    ).astype(jnp.float32)


def _kron_i3(Wx: jax.Array) -> jax.Array:
    """kron(Wx.T, I3): [src, out] -> [src*3, out*3] so a folded [.., W*3]
    row vector right-multiplied by it yields the resampled [.., out*3]."""
    out, src = Wx.shape
    K = Wx.T[:, None, :, None] * jnp.eye(3, dtype=Wx.dtype)[None, :, None, :]
    return K.reshape(src * 3, out * 3)


def _resample_folded(x: jax.Array, Wy: jax.Array, Kx: jax.Array) -> jax.Array:
    """x: [T, H, W*3]; Wy: [out, H]; Kx: [W*3, out*3] -> [T, out, out*3]."""
    x = jnp.einsum("yh,thw->tyw", Wy, x)
    return jnp.einsum("tyw,wx->tyx", x, Kx)


def _sample_crop_box(key, src: int, scale: Tuple[float, float],
                     ratio: Tuple[float, float]):
    """torchvision-style random resized crop box on a src x src frame:
    area uniform in scale*src^2, aspect log-uniform in ratio; clamped into
    bounds (static control flow instead of the 10-attempt rejection loop —
    negligible distribution difference, documented)."""
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1])
    area = area * src * src
    log_r = jax.random.uniform(
        k_ratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    w = jnp.clip(jnp.sqrt(area * r), 8.0, float(src))
    h = jnp.clip(jnp.sqrt(area / r), 8.0, float(src))
    top = jax.random.uniform(k_top, ()) * (src - h)
    left = jax.random.uniform(k_left, ()) * (src - w)
    return top, left, h, w


@functools.partial(jax.jit, static_argnames=("out_size", "scale", "ratio"))
def random_resized_crop_flip(key: jax.Array, frames: jax.Array,
                             out_size: int = 224,
                             scale: Tuple[float, float] = (0.5, 1.0),
                             ratio: Tuple[float, float] = (3 / 4, 4 / 3)
                             ) -> jax.Array:
    """Train aug: per-clip random resized crop + horizontal flip + normalize.

    frames: [B, T, pre, pre, 3] (or channel-folded [B, T, pre, pre*3])
    uint8/float -> [B, T, out, out*3] float32 CHANNEL-FOLDED normalized.
    One crop box per clip, shared across its frames (the torchvision
    *Video* transforms behave the same way).
    """
    if frames.ndim == 5:
        frames = fold_channels(frames)
    B, T, H, WC = frames.shape
    W = WC // 3
    x = _to_float(frames)

    keys = jax.random.split(key, B + 1)
    flip_key, clip_keys = keys[0], keys[1:]
    do_flip = jax.random.bernoulli(flip_key, 0.5, (B,))

    def one(clip, k, flip):
        top, left, h, w = _sample_crop_box(k, H, scale, ratio)
        Wy = _interp_weights(H, out_size, top, h)
        Wx = _interp_weights(W, out_size, left, w)
        Wx = jnp.where(flip, Wx[::-1], Wx)  # flip = reversed output rows
        return _resample_folded(clip, Wy, _kron_i3(Wx))

    x = jax.vmap(one)(x, clip_keys, do_flip)
    return normalize_folded(x, out_size)


@functools.partial(jax.jit, static_argnames=("out_size",))
def eval_resize(frames: jax.Array, out_size: int = 224) -> jax.Array:
    """Eval path: bilinear resize pre -> out + normalize, channel-folded.

    The host decoder already performed short-side-256 + center-crop-256
    (the reference's Resize(256)+CenterCrop(256)); this is the final
    Resize(224) + Normalize."""
    if frames.ndim == 5:
        frames = fold_channels(frames)
    B, T, H, WC = frames.shape
    W = WC // 3
    x = _to_float(frames)
    if (H, W) != (out_size, out_size):
        Wy = _interp_weights(H, out_size, 0.0, float(H))
        Kx = _kron_i3(_interp_weights(W, out_size, 0.0, float(W)))
        x = jnp.einsum("yh,bthw->btyw", Wy, x)
        x = jnp.einsum("btyw,wx->btyx", x, Kx)
    return normalize_folded(x, out_size)


@functools.partial(jax.jit, static_argnames=("out_size", "scale", "ratio"))
def train_transform(key, frames, out_size: int = 224,
                    scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3)):
    return random_resized_crop_flip(key, frames, out_size, scale, ratio)


test_transform = eval_resize


# --------------------------------------------------------------------------
# eval-time multi-crop helpers (reference utils/custom_transforms.py:
# center_plus_four_crops, center_plus_twohori_crops, TwoHoriCrop — used for
# ensemble-style evaluation)
# --------------------------------------------------------------------------

def _crop_folded(x: jax.Array, top: int, left: int, size: int) -> jax.Array:
    """x: [..., H, W*3] channel-folded; static crop box."""
    return x[..., top:top + size, left * 3:(left + size) * 3]


@functools.partial(jax.jit, static_argnames=("crop_size",))
def center_plus_four_crops(frames: jax.Array, crop_size: int):
    """-> [5, ...] stack: center + four corners (each crop_size^2)."""
    if frames.ndim == 5:
        frames = fold_channels(frames)
    H, WC = frames.shape[-2], frames.shape[-1]
    W = WC // 3
    ct, cl = (H - crop_size) // 2, (W - crop_size) // 2
    boxes = [
        (ct, cl),                         # center
        (0, 0),                           # top-left
        (0, W - crop_size),               # top-right
        (H - crop_size, 0),               # bottom-left
        (H - crop_size, W - crop_size),   # bottom-right
    ]
    return jnp.stack([_crop_folded(frames, t, l, crop_size)
                      for t, l in boxes])


@functools.partial(jax.jit, static_argnames=("crop_size",))
def center_plus_two_horizontal_crops(frames: jax.Array, crop_size: int):
    """-> [3, ...] stack: center + left + right crops."""
    if frames.ndim == 5:
        frames = fold_channels(frames)
    H, WC = frames.shape[-2], frames.shape[-1]
    W = WC // 3
    ct = (H - crop_size) // 2
    boxes = [((H - crop_size) // 2, (W - crop_size) // 2),
             (ct, 0), (ct, W - crop_size)]
    return jnp.stack([_crop_folded(frames, t, l, crop_size)
                      for t, l in boxes])


@functools.partial(jax.jit, static_argnames=("crop_size", "index"))
def two_horizontal_crop(frames: jax.Array, crop_size: int, index: int):
    """TwoHoriCrop equivalent: index 0 = left, 1 = right."""
    if frames.ndim == 5:
        frames = fold_channels(frames)
    H, WC = frames.shape[-2], frames.shape[-1]
    W = WC // 3
    left = 0 if index == 0 else W - crop_size
    top = (H - crop_size) // 2
    return _crop_folded(frames, top, left, crop_size)
