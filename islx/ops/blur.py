"""Gaussian blur with exact scipy.ndimage.gaussian_filter semantics, as matmuls.

The reference smooths every heatmap channel with
``gaussian_filter(map, sigma=3)`` before peak-finding (src/body.py:88,
src/hand.py:61): sigma=3, truncate=4.0 (radius 12, 25-tap kernel), boundary
mode 'reflect' (== np.pad 'symmetric').

TPU-first design: a separable blur with reflected boundaries folds into two
dense banded matrices ``B_h[H,H]`` and ``B_w[W,W]`` (boundary reflection is
absorbed into the matrix), so the whole blur is two MXU matmuls over all
channels at once — no pad, no conv, no per-channel host loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d, normalized."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return (phi / phi.sum()).astype(np.float64)


def _reflect_index(p: np.ndarray, n: int) -> np.ndarray:
    """scipy 'reflect' mode index folding: (d c b a | a b c d | d c b a)."""
    if n == 1:
        return np.zeros_like(p)
    period = 2 * n
    p = np.mod(p, period)
    p = np.where(p < 0, p + period, p)
    return np.where(p < n, p, period - 1 - p)


@functools.lru_cache(maxsize=256)
def _blur_matrix(n: int, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """[n,n] matrix equal to 1-D gaussian correlation with reflect boundary."""
    k = gaussian_kernel1d(sigma, truncate)
    radius = (len(k) - 1) // 2
    mat = np.zeros((n, n), np.float64)
    rows = np.arange(n)
    for t, w in enumerate(k):
        cols = _reflect_index(rows - radius + t, n)
        np.add.at(mat, (rows, cols), w)
    return mat.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def gaussian_blur(img: jax.Array, sigma: float = 3.0,
                  truncate: float = 4.0) -> jax.Array:
    """Blur [H,W,C] (or [H,W]) per channel; matches scipy gaussian_filter."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w = img.shape[0], img.shape[1]
    bh = jnp.asarray(_blur_matrix(h, sigma, truncate))
    bw = jnp.asarray(_blur_matrix(w, sigma, truncate))
    x = img.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST  # f32 even on TPU; see islx.ops.resize
    x = jnp.einsum("oh,hwc->owc", bh, x, precision=hi)
    x = jnp.einsum("pw,owc->opc", bw, x, precision=hi)
    return x[:, :, 0] if squeeze else x
