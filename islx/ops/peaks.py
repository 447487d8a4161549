"""Body-joint peak extraction (gaussian NMS), fully on device.

Replaces the reference's per-channel host loop (src/body.py:86-107: scipy
gaussian_filter + four shifted-array comparisons + np.nonzero) with one jitted
program over all joint channels:

    blur (2 MXU matmuls) -> 4-neighbour NMS (VPU) -> static top-K per channel.

Peak order matches the reference exactly: row-major (y, then x) within each
channel — np.nonzero order — achieved by top-K over negated flat indices.
Ragged python lists become fixed-K arrays with validity masks (XLA needs
static shapes); K=32 comfortably exceeds any realistic per-joint people count.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from islx.ops.blur import gaussian_blur


class Peaks(NamedTuple):
    """Fixed-size peak set per channel.

    xy:    [C, K, 2] int32 (x, y) coordinates, row-major order per channel
    score: [C, K] float32 — value of the UNBLURRED averaged heatmap at (y, x)
    valid: [C, K] bool
    count: [C] int32
    """

    xy: jax.Array
    score: jax.Array
    valid: jax.Array
    count: jax.Array


def _nms_mask(b: jax.Array, thre1: float) -> jax.Array:
    """4-neighbour plateau NMS (reference semantics: src/body.py:90-100).

    b: [H,W,C] blurred heatmaps. Out-of-image neighbours compare as 0.
    """
    zrow = jnp.zeros_like(b[:1])
    zcol = jnp.zeros_like(b[:, :1])
    up = jnp.concatenate([zrow, b[:-1]], axis=0)      # map_left in reference
    down = jnp.concatenate([b[1:], zrow], axis=0)     # map_right
    left = jnp.concatenate([zcol, b[:, :-1]], axis=1)  # map_up
    right = jnp.concatenate([b[:, 1:], zcol], axis=1)  # map_down
    return (b >= up) & (b >= down) & (b >= left) & (b >= right) & (b > thre1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def find_peaks(heatmap: jax.Array, thre1: float, k: int = 32,
               sigma: float = 3.0) -> Peaks:
    """heatmap: [H,W,C] averaged (unblurred) heatmaps -> Peaks over C channels.

    The caller passes only the joint channels (reference drops the background
    channel: ``range(njoint-1)``, src/body.py:86).
    """
    h, w, c = heatmap.shape
    blurred = gaussian_blur(heatmap, sigma)
    mask = _nms_mask(blurred, thre1)                      # [H,W,C]

    flat_mask = mask.transpose(2, 0, 1).reshape(c, h * w)
    flat_idx = jnp.arange(h * w, dtype=jnp.int32)
    # top_k of negated index over masked positions -> K smallest flat indices
    # (row-major order). Invalid slots get index h*w (sentinel).
    keyed = jnp.where(flat_mask, flat_idx[None, :], h * w)
    neg, _ = jax.lax.top_k(-keyed, k)
    idx = -neg                                            # [C,K] ascending
    valid = idx < h * w
    idx = jnp.where(valid, idx, 0)
    y = idx // w
    x = idx % w
    flat_scores = heatmap.transpose(2, 0, 1).reshape(c, h * w)
    score = jnp.take_along_axis(flat_scores, idx, axis=1)
    score = jnp.where(valid, score, 0.0)
    xy = jnp.stack([x, y], axis=-1).astype(jnp.int32)
    count = valid.sum(axis=1).astype(jnp.int32)
    return Peaks(xy=xy, score=score, valid=valid, count=count)
