"""Input preprocessing: stride-pad + normalize, fused on device.

Mirrors the reference's host-side numpy chain (src/util.py:12-32
``padRightDownCorner`` + src/body.py:55 ``/256 - 0.5`` NCHW transpose) as one
jitted NHWC op. Padding amounts are static (shape-derived), so everything
stays inside a single XLA program.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pad_amounts(h: int, w: int, stride: int) -> Tuple[int, int]:
    """(pad_down, pad_right) to reach the next stride multiple
    (reference: src/util.py:19-20)."""
    pd = 0 if h % stride == 0 else stride - (h % stride)
    pr = 0 if w % stride == 0 else stride - (w % stride)
    return pd, pr


def pad_normalize(img: jax.Array, stride: int = 8,
                  pad_value: int = 128) -> Tuple[jax.Array, Tuple[int, int]]:
    """[H,W,3] (any dtype) -> float32 [1,H',W',3] in [-0.5, ~0.5), stride-padded.

    Returns (batch-of-one NHWC tensor, (pad_down, pad_right)).
    """
    h, w = img.shape[0], img.shape[1]
    pd, pr = pad_amounts(h, w, stride)
    x = img.astype(jnp.float32)
    x = jnp.pad(x, ((0, pd), (0, pr), (0, 0)), constant_values=float(pad_value))
    x = x / 256.0 - 0.5
    return x[None], (pd, pr)


def pad_normalize_batch(imgs: jax.Array, stride: int = 8,
                        pad_value: int = 128) -> Tuple[jax.Array, Tuple[int, int]]:
    """[B,H,W,3] -> float32 [B,H',W',3]; same padding for the whole batch."""
    h, w = imgs.shape[1], imgs.shape[2]
    pd, pr = pad_amounts(h, w, stride)
    x = imgs.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (0, pd), (0, pr), (0, 0)),
                constant_values=float(pad_value))
    return x / 256.0 - 0.5, (pd, pr)
