"""On-device video transforms (batched, jitted).

The reference runs torchvision video transforms on CPU dataloader workers
(/root/reference/data_loader/transforms.py:34-62): train =
RandomResizedCropVideo(224, scale=(0.5, 1)) + RandomHorizontalFlipVideo +
ColorJitter(0,0,0) (a no-op) + ImageNet normalize; eval = Resize(256) ->
CenterCrop(256) -> Resize(224) -> normalize.

TPU-native split (BASELINE.md north star): the host decoder emits fixed
``[T, pre, pre, 3]`` uint8 frames (short-side resize + center crop to
``pre`` = 256, done during decode), everything after raw RGB runs on-device
as one fused XLA program over the whole batch:

  * train: per-clip random resized crop implemented with
    ``jax.image.scale_and_translate`` (one gather-matmul resample instead of
    crop-then-resize), random horizontal flip, normalize.  The crop box is
    sampled by area/log-aspect like torchvision, but clamped into bounds
    instead of torchvision's 10-attempt rejection loop (static control
    flow; the distribution difference is negligible and documented).
  * eval: bilinear resize pre->res + normalize.

All functions take/return channels-last float32/uint8 and are shaped
``[B, T, H, W, 3]``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(frames: jax.Array) -> jax.Array:
    """frames: float [..., 3] in [0, 1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, frames.dtype)
    std = jnp.asarray(IMAGENET_STD, frames.dtype)
    return (frames - mean) / std


def _to_float(frames: jax.Array) -> jax.Array:
    if frames.dtype == jnp.uint8:
        return frames.astype(jnp.float32) / 255.0
    return frames.astype(jnp.float32)


def _sample_crop_box(key, src: int, scale: Tuple[float, float],
                     ratio: Tuple[float, float]):
    """Sample (top, left, h, w) for a random resized crop on a src x src
    frame. torchvision-style: area uniform in scale*src^2, aspect ratio
    log-uniform in ratio; clamped to the frame."""
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1])
    area = area * src * src
    log_r = jax.random.uniform(
        k_ratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    w = jnp.clip(w, 8.0, float(src))
    h = jnp.clip(h, 8.0, float(src))
    top = jax.random.uniform(k_top, (), minval=0.0, maxval=1.0) * (src - h)
    left = jax.random.uniform(k_left, (), minval=0.0, maxval=1.0) * (src - w)
    return top, left, h, w


def _resample_clip(clip: jax.Array, top, left, h, w, out: int) -> jax.Array:
    """clip: [T, H, W, C] float; resample crop box to out x out with a
    linear kernel (matches bilinear interpolation of the crop)."""
    T, H, W, C = clip.shape
    scale = jnp.stack([out / h, out / w])
    translation = jnp.stack([-top * out / h, -left * out / w])
    return jax.image.scale_and_translate(
        clip, (T, out, out, C), (1, 2), scale, translation,
        method="linear", antialias=False,
    )


@functools.partial(jax.jit, static_argnames=("out_size", "scale", "ratio"))
def random_resized_crop_flip(key: jax.Array, frames: jax.Array,
                             out_size: int = 224,
                             scale: Tuple[float, float] = (0.5, 1.0),
                             ratio: Tuple[float, float] = (3 / 4, 4 / 3)
                             ) -> jax.Array:
    """Train-time aug: per-clip random resized crop + horizontal flip.

    frames: [B, T, pre, pre, 3] uint8/float -> [B, T, out, out, 3] float32
    (normalized).  One crop box per clip, shared across its frames — the
    torchvision *Video* transforms behave the same way.
    """
    B, T, H, W, C = frames.shape
    x = _to_float(frames)

    keys = jax.random.split(key, B + 1)
    flip_key, clip_keys = keys[0], keys[1:]

    def one(clip, k):
        top, left, h, w = _sample_crop_box(k, H, scale, ratio)
        return _resample_clip(clip, top, left, h, w, out_size)

    x = jax.vmap(one)(x, clip_keys)
    do_flip = jax.random.bernoulli(flip_key, 0.5, (B, 1, 1, 1, 1))
    x = jnp.where(do_flip, x[:, :, :, ::-1, :], x)
    return normalize(x)


@functools.partial(jax.jit, static_argnames=("out_size",))
def eval_resize(frames: jax.Array, out_size: int = 224) -> jax.Array:
    """Eval path: bilinear resize to out x out + normalize.

    The host decoder already performed short-side-256 + center-crop-256
    (the reference's Resize(256)+CenterCrop(256)); this is the final
    Resize(224) + Normalize."""
    B, T, H, W, C = frames.shape
    x = _to_float(frames)
    if (H, W) != (out_size, out_size):
        x = jax.image.resize(
            x, (B, T, out_size, out_size, C), method="bilinear",
            antialias=False,
        )
    return normalize(x)


@functools.partial(jax.jit, static_argnames=("out_size", "scale", "ratio"))
def train_transform(key, frames, out_size: int = 224,
                    scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3)):
    return random_resized_crop_flip(key, frames, out_size, scale, ratio)


test_transform = eval_resize
