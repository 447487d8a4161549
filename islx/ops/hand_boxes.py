"""Device hand-box placement from PAF connection scores.

The reference derives hand crops from fully-grouped people on the host
(src/util.py:242-306 wrist/elbow/shoulder geometry, applied after
src/body.py's greedy grouping). That forces a device->host round trip
between the body and hand networks: fetch peaks, group on host, compute
boxes, dispatch the hand net. On a tunneled TPU runtime every fetch pays a
~100ms fixed RPC cost, so the round trip costs more than the hand network.

This op keeps box placement ON DEVICE: instead of full grouping it chains
the best-scoring PAF connections per arm side — elbow->wrist first, then the
shoulder->elbow connection ending at that elbow — which are exactly the
edges the greedy grouper picks for isolated arms, then applies the
reference's box geometry bit-for-bit (extrapolate from the wrist along
elbow->wrist by 0.33, square width 1.5*max(|we|, 0.9*|es|), clamp, drop
under 20px). Full grouping still runs on host for the skeleton output; hand
crops just no longer wait for it. Divergence: crowded multi-person scenes
may chain a different person's arm than the grouper — one box per side per
frame (PARITY.md).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from islx.core.config import DetectorConfig


def arm_limb_rows(limb_seq: np.ndarray) -> Tuple[Tuple[int, int],
                                                 Tuple[int, int]]:
    """-> ((se_left, ew_left), (se_right, ew_right)) limb-table row indices.

    Joint channels follow the reference convention for both body25 and coco:
    right arm = shoulder 2 / elbow 3 / wrist 4, left arm = 5 / 6 / 7
    (src/util.py:254-261).
    """
    rows = {tuple(p): i for i, p in enumerate(np.asarray(limb_seq).tolist())}
    return ((rows[(5, 6)], rows[(6, 7)]), (rows[(2, 3)], rows[(3, 4)]))


def _chain_side(pair: jax.Array, score: jax.Array, ok: jax.Array,
                se: int, ew: int, k: int):
    """Best elbow->wrist connection, then shoulder->elbow ending there.

    pair/score/ok: [L, M] compact connection tables (islx.ops.paf
    CompactConnections, pair = elbow_idx * K + wrist_idx for row ew).
    -> (shoulder_idx, elbow_idx, wrist_idx, found) scalars.
    """
    sc_ew = jnp.where(ok[ew], score[ew], -jnp.inf)
    m_ew = jnp.argmax(sc_ew)
    has_ew = sc_ew[m_ew] > -jnp.inf
    ei = pair[ew][m_ew] // k
    wj = pair[ew][m_ew] % k
    sc_se = jnp.where(ok[se] & (pair[se] % k == ei), score[se], -jnp.inf)
    m_se = jnp.argmax(sc_se)
    has_se = sc_se[m_se] > -jnp.inf
    si = pair[se][m_se] // k
    return si, ei, wj, has_ew & has_se


def device_hand_boxes(pk_xy: jax.Array, cc_pair: jax.Array,
                      cc_score: jax.Array, cc_ok: jax.Array,
                      limb_seq: np.ndarray,
                      sy: float, sx: float, hb: int, wb: int,
                      cfg: DetectorConfig = DetectorConfig()) -> jax.Array:
    """One frame's peaks + connections -> [2, 3] i32 (x0, y0, w) hand boxes
    in BUCKET coords, row 0 = left hand, row 1 = right; w == 0 marks a side
    with no detectable arm. Geometry runs in original-image coordinates
    (sy/sx = orig/bucket scale) exactly like the host path
    (islx.pose.detector.hand_detect + batch_pose.detect_hand_boxes).
    """
    k = pk_xy.shape[1]
    oh, ow = hb * sy, wb * sx
    arms = arm_limb_rows(limb_seq)

    def one_side(se: int, ew: int) -> jax.Array:
        s_chan, e_chan = int(limb_seq[se][0]), int(limb_seq[se][1])
        w_chan = int(limb_seq[ew][1])
        si, ei, wj, found = _chain_side(cc_pair, cc_score, cc_ok, se, ew, k)
        scale = jnp.asarray([sx, sy], jnp.float32)
        p_s = pk_xy[s_chan, si].astype(jnp.float32) * scale
        p_e = pk_xy[e_chan, ei].astype(jnp.float32) * scale
        p_w = pk_xy[w_chan, wj].astype(jnp.float32) * scale
        # reference geometry, src/util.py:270-296
        c = p_w + cfg.ratio_wrist_elbow * (p_w - p_e)
        d_we = jnp.sqrt(((p_w - p_e) ** 2).sum())
        d_es = jnp.sqrt(((p_e - p_s) ** 2).sum())
        width = cfg.width_scale * jnp.maximum(d_we,
                                              cfg.shoulder_ratio * d_es)
        x = jnp.maximum(c[0] - width / 2.0, 0.0)
        y = jnp.maximum(c[1] - width / 2.0, 0.0)
        width = jnp.minimum(jnp.minimum(width, ow - x), oh - y)
        ok_box = found & (width >= cfg.min_box)
        # int truncation (host int()), then orig->bucket mapping exactly as
        # batch_pose.detect_hand_boxes
        xi, yi, wi = jnp.floor(x), jnp.floor(y), jnp.floor(width)
        bx = jnp.minimum(jnp.rint(xi / sx), wb - 1).astype(jnp.int32)
        by = jnp.minimum(jnp.rint(yi / sy), hb - 1).astype(jnp.int32)
        bw = jnp.maximum(jnp.minimum(jnp.minimum(
            jnp.rint(wi / sx).astype(jnp.int32), wb - bx), hb - by), 1)
        bw = jnp.where(ok_box, bw, 0)
        return jnp.stack([bx, by, bw])

    return jnp.stack([one_side(*arms[0]), one_side(*arms[1])])
