"""Hand pose estimator — reference-compatible API, TPU-native execution.

``Hand(weights)(crop)`` returns 21 ``(x, y)`` keypoints with ``(0, 0)``
sentinels for missing parts, exactly like the reference (src/hand.py:24-74),
but the 4-scale pyramid, CPM forward, heatmap averaging and the per-part
connected-component peak extraction run as ONE jitted program per crop shape
(the reference runs 4 sequential device round trips plus a 21-part host loop
with skimage labelling).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from islx.core.config import HandConfig
from islx.models import cpm
from islx.ops import preprocess
from islx.ops.hand_peaks import find_hand_peaks
from islx.ops.resize import output_size, resize_cubic


def _hand_heatmap(params, img, cfg: HandConfig, compute_dtype,
                  forward=None) -> jax.Array:
    """u8 img [H,W,3] -> averaged heatmap [H,W,22] (src/hand.py:35-56)."""
    if forward is None:
        forward = lambda p, x, cd: cpm.hand_forward(  # noqa: E731
            p, x, cd, cfg.stages)
    h, w = img.shape[0], img.shape[1]
    heat_sum = jnp.zeros((h, w, 22), jnp.float32)
    n = len(cfg.scale_search)
    for s in cfg.scale_search:
        scale = s * cfg.boxsize / h
        hs, ws = output_size(h, scale), output_size(w, scale)
        scaled = resize_cubic(img, hs, ws, saturate_uint8=True)
        x, (pd, pr) = preprocess.pad_normalize(scaled, cfg.stride, cfg.pad_value)
        heat = forward(params, x, compute_dtype)
        hp, wp = x.shape[1], x.shape[2]
        m = resize_cubic(heat[0], hp, wp)
        m = m[:hp - pd, :wp - pr]
        m = resize_cubic(m, h, w)
        heat_sum = heat_sum + m / n       # correct mean (src/hand.py:56)
    return heat_sum


class Hand:
    """Reference-compatible hand estimator (drop-in for reference src/hand.py:15)."""

    def __init__(self, weights: Union[str, cpm.Params, None] = None,
                 config: Optional[HandConfig] = None,
                 compute_dtype=jnp.float32,
                 forward_fn=None):
        self.cfg = config or HandConfig()
        self.compute_dtype = compute_dtype
        self.forward_fn = forward_fn  # test/benchmark hook; None = real CPM
        if weights is None:
            self.params = cpm.init_params("hand")
        elif isinstance(weights, str):
            from islx.core import weights as W

            self.params = W.load(weights, "hand")
        else:
            self.params = weights
        self._jitted = {}

    def _program(self, h: int, w: int):
        key = (h, w)
        if key not in self._jitted:
            cfg = self.cfg
            cd = self.compute_dtype

            fwd = self.forward_fn

            @jax.jit
            def program(params, img):
                heat = _hand_heatmap(params, img, cfg, cd, fwd)
                return find_hand_peaks(heat[:, :, :cfg.n_parts], cfg.thre)

            self._jitted[key] = program
        return self._jitted[key]

    def heatmap(self, crop: np.ndarray) -> np.ndarray:
        """Averaged [H,W,22] heatmap — for debugging/tests."""
        key = ("heatmap", crop.shape[0], crop.shape[1])
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda p, x: _hand_heatmap(p, x, self.cfg,
                                           self.compute_dtype,
                                           self.forward_fn))
        return np.asarray(self._jitted[key](self.params, jnp.asarray(crop)))

    def __call__(self, crop: np.ndarray) -> np.ndarray:
        """BGR u8 [H,W,3] crop -> peaks [21,2] int (x, y); (0,0) = missing."""
        h, w = crop.shape[:2]
        pk = self._program(h, w)(self.params, jnp.asarray(crop))
        return np.asarray(pk.xy)
