"""Body pose estimator — reference-compatible API, TPU-native execution.

``Body(weights, model_type)(oriImg)`` returns ``(candidate[N,4], subset[P,
njoint+2])`` exactly like the reference (src/body.py:39,233-235), but the
whole per-image pipeline — multi-scale resize, stride-pad, normalize, CPM
forward, x8 cubic upsample, de-pad, back-to-original resize, scale averaging,
gaussian NMS and PAF line-integral scoring — runs as ONE jitted XLA program
per image shape. Only the final greedy person grouping (tiny, sequential)
runs on host (islx.ops.grouping).

The reference pays a host<->device round trip per scale and does all
post-processing in per-peak python loops (src/body.py:51-175 host hot loops);
here a single device program emits fixed-size peak/limb tensors.

Multi-scale averaging: the reference accumulates body heatmaps incorrectly
(src/body.py:80 adds the running average into itself). With the default
single scale the bug is invisible; set ``PoseConfig.ref_compat_averaging``
for bit-parity in multi-scale experiments, default is the correct mean.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from islx.core.config import PoseConfig
from islx.models import cpm
from islx.ops import grouping, preprocess
from islx.ops.paf import LIMB_TABLES, score_limbs
from islx.ops.peaks import find_peaks
from islx.ops.resize import output_size, resize_cubic


def _compute_maps(params, img, model_type: str, cfg: PoseConfig,
                  compute_dtype, forward=None) -> Tuple[jax.Array, jax.Array]:
    """u8/f32 img [H,W,3] -> (heat_avg[H,W,njoint], paf_avg[H,W,npaf])."""
    h, w = img.shape[0], img.shape[1]
    if forward is None:
        forward = cpm.FORWARDS[model_type]
    heat_sum = jnp.zeros((h, w, cfg.njoint), jnp.float32)
    paf_sum = jnp.zeros((h, w, cfg.npaf), jnp.float32)
    n = len(cfg.scale_search)
    for s in cfg.scale_search:
        scale = s * cfg.boxsize / h
        hs, ws = output_size(h, scale), output_size(w, scale)
        scaled = resize_cubic(img, hs, ws, saturate_uint8=True)
        x, (pd, pr) = preprocess.pad_normalize(scaled, cfg.stride, cfg.pad_value)
        paf, heat = forward(params, x, compute_dtype)
        hp, wp = x.shape[1], x.shape[2]

        def to_orig(maps):  # [1,h8,w8,C] -> [H,W,C] (src/body.py:69-78)
            m = resize_cubic(maps[0], hp, wp)        # x8 cubic upsample
            m = m[:hp - pd, :wp - pr]                 # remove stride pad
            return resize_cubic(m, h, w)              # back to original

        heat_o, paf_o = to_orig(heat), to_orig(paf)
        if cfg.ref_compat_averaging:
            # reference bug (src/body.py:80): avg += avg + heat/n
            heat_sum = heat_sum + heat_sum + heat_o / n
            paf_sum = paf_sum + paf_o / n
        else:
            heat_sum = heat_sum + heat_o / n
            paf_sum = paf_sum + paf_o / n
    return heat_sum, paf_sum


class Body:
    """Reference-compatible body estimator (drop-in for reference src/body.py:15).

    weights: a cpm params pytree, or a checkpoint path (.pt/.npz/.caffemodel),
             or None for random init (tests/benchmarks).
    """

    def __init__(self, weights: Union[str, cpm.Params, None] = None,
                 model_type: str = "body25",
                 config: Optional[PoseConfig] = None,
                 compute_dtype=jnp.float32,
                 forward_fn=None):
        if model_type not in ("body25", "coco"):
            model_type = "coco"  # reference fallback (src/body.py:25-29)
        self.model_type = model_type
        self.cfg = config or PoseConfig(model_type=model_type)
        if self.cfg.model_type != model_type:
            self.cfg = dataclasses.replace(self.cfg, model_type=model_type)
        self.compute_dtype = compute_dtype
        if weights is None:
            self.params = cpm.init_params(model_type)
        elif isinstance(weights, str):
            from islx.core import weights as W

            self.params = W.load(weights, model_type)
        else:
            self.params = weights
        self.forward_fn = forward_fn  # test/benchmark hook; None = real CPM
        self.limb_seq, self.map_idx = LIMB_TABLES[model_type]
        self._jitted = {}

    def _program(self, h: int, w: int):
        """Build/cache the fused device program for an (h, w) image."""
        key = (h, w)
        if key not in self._jitted:
            cfg = self.cfg
            mt = self.model_type
            cd = self.compute_dtype
            limb_seq = jnp.asarray(self.limb_seq)
            map_idx = jnp.asarray(self.map_idx)

            fwd = self.forward_fn

            @jax.jit
            def program(params, img):
                heat, paf = _compute_maps(params, img, mt, cfg, cd, fwd)
                pk = find_peaks(heat[:, :, :cfg.njoint - 1], cfg.thre1,
                                cfg.max_peaks)
                ls = score_limbs(paf, pk.xy, pk.valid, limb_seq, map_idx,
                                 cfg.thre2, cfg.mid_num,
                                 orig_h=jnp.float32(h))
                return pk, ls

            self._jitted[key] = program
        return self._jitted[key]

    def maps(self, ori_img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(heatmap_avg[H,W,njoint], paf_avg[H,W,npaf]) — for debugging/tests."""
        key = ("maps", ori_img.shape[0], ori_img.shape[1])
        if key not in self._jitted:
            self._jitted[key] = jax.jit(functools.partial(
                _compute_maps, model_type=self.model_type, cfg=self.cfg,
                compute_dtype=self.compute_dtype, forward=self.forward_fn))
        heat, paf = self._jitted[key](self.params, jnp.asarray(ori_img))
        return np.asarray(heat), np.asarray(paf)

    def __call__(self, ori_img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """BGR u8 [H,W,3] -> (candidate[N,4], subset[P,njoint+2])."""
        h, w = ori_img.shape[:2]
        pk, ls = self._program(h, w)(self.params, jnp.asarray(ori_img))
        return grouping.assemble(
            np.asarray(pk.xy), np.asarray(pk.score), np.asarray(pk.count),
            np.asarray(ls.score), np.asarray(ls.ok),
            self.limb_seq, self.cfg.njoint)
