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


def _k_smallest(keyed: jax.Array, k: int, two_stage: bool) -> jax.Array:
    """K smallest values per row of [C, N] (sentinel = N)."""
    c, n = keyed.shape
    if not two_stage:
        neg, _ = jax.lax.top_k(-keyed, k)
        return -neg
    # Hierarchical: per-block top-8, then global top-k over block winners.
    # Exact unless some block holds >8 peaks — NMS peaks are 4-isolated and
    # thresholded, so a ~12-row block with >8 peaks means pathological noise
    # (production path only; the parity path uses the exact single stage).
    kb = min(8, k)
    block = 2048
    nb = -(-n // block)
    pad = nb * block - n
    padded = jnp.pad(keyed, ((0, 0), (0, pad)), constant_values=n)
    blocks = padded.reshape(c, nb, block)
    neg, _ = jax.lax.top_k(-blocks, kb)                   # [C, nb, kb]
    neg2, _ = jax.lax.top_k(neg.reshape(c, nb * kb), k)
    return -neg2


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def find_peaks(heatmap: jax.Array, thre1: float, k: int = 32,
               sigma: float = 3.0, two_stage: bool = False) -> Peaks:
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
    idx = _k_smallest(keyed, k, two_stage)                # [C,K] ascending
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
