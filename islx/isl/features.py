"""Pose -> ISL feature vectors.

Re-implements the reference's feature serialization chain —
``util.get_bodypose`` (src/util.py:99-151), ``util.get_handpose``
(src/util.py:187-219) and ``ISLSignPosTranslator.populate_features``
(src/ISL_Model_parameter.py:376-443) — as small pure functions producing the
exact 156-dim per-frame vector the BiLSTM head consumes:

    [15 body x | 15 body y | hand0: 21 x, 21 y, 21 part-idx |
     hand1: 21 x, 21 y, 21 part-idx]

Body entries enumerate (joint-major, then person) the detected keypoints and
truncate/zero-pad to 15; hand part-idx columns are the stringified indices the
reference round-trips through str() (src/ISL_Model_parameter.py:410).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import math

import numpy as np

FEATURE_DIM = 156

HAND_EDGES = [[0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8],
              [0, 9], [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15],
              [15, 16], [0, 17], [17, 18], [18, 19], [19, 20]]

# limb tables shared with islx.ops.paf (reference src/util.py:50-57)
from islx.ops.paf import LIMB_SEQ_BODY25, LIMB_SEQ_COCO  # noqa: E402


def get_bodypose(candidate: np.ndarray, subset: np.ndarray,
                 model_type: str = "body25"
                 ) -> Tuple[List[Tuple[float, float]],
                            List[Tuple[float, float, float, float]]]:
    """-> (circles [(x, y)...], sticks [(mean_x, mean_y, angle_deg, length)...]).

    Same enumeration order as reference src/util.py:122-148: joints-major for
    circles, limb-major for sticks.
    """
    limb_seq = LIMB_SEQ_BODY25 if model_type == "body25" else LIMB_SEQ_COCO
    njoint = 25 if model_type == "body25" else 18

    circles = []
    for i in range(njoint):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            circles.append((float(x), float(y)))

    sticks = []
    for i in range(njoint - 1):
        for n in range(len(subset)):
            index = subset[n][np.array(limb_seq[i])]
            if -1 in index:
                continue
            xs = candidate[index.astype(int), 0]
            ys = candidate[index.astype(int), 1]
            length = float(math.hypot(xs[0] - xs[1], ys[0] - ys[1]))
            angle = float(math.degrees(math.atan2(ys[0] - ys[1], xs[0] - xs[1])))
            sticks.append((float(np.mean(xs)), float(np.mean(ys)), angle, length))
    return circles, sticks


def get_handpose(all_hand_peaks: Sequence[np.ndarray]
                 ) -> Tuple[List[list], List[list]]:
    """-> (edges[2], peaks[2]) for up to two hands.

    peaks[h] = [(x, y, str(i)) x21]; edges[h] = [(edge_idx, (x1,y1), (x2,y2))]
    for edges whose endpoints are both detected (reference src/util.py:200-219).
    The reference indexes fixed two-hand lists and crashes on a third hand;
    we take the first two.
    """
    export_edges: List[list] = [[], []]
    export_peaks: List[list] = [[], []]
    for idx, peaks in enumerate(all_hand_peaks[:2]):
        peaks = np.asarray(peaks)
        for ie, e in enumerate(HAND_EDGES):
            if np.sum(np.all(peaks[e], axis=1) == 0) == 0:
                x1, y1 = peaks[e[0]]
                x2, y2 = peaks[e[1]]
                export_edges[idx].append((ie, (x1, y1), (x2, y2)))
        for i, (x, y) in enumerate(peaks):
            export_peaks[idx].append((x, y, str(i)))
    return export_edges, export_peaks


def populate_features(bodypose_circles: Sequence[Tuple[float, float]],
                      handpose_peaks: Sequence[list]) -> np.ndarray:
    """-> float64 [156] (reference src/ISL_Model_parameter.py:376-443)."""
    feature: List[float] = []
    for idx in range(15):
        feature.append(bodypose_circles[idx][0] if idx < len(bodypose_circles)
                       else 0.0)
    for idx in range(15):
        feature.append(bodypose_circles[idx][1] if idx < len(bodypose_circles)
                       else 0.0)
    for hand_idx in range(2):
        peaks = handpose_peaks[hand_idx]
        for col in range(3):
            for idx in range(21):
                feature.append(float(peaks[idx][col]) if idx < len(peaks)
                               else 0.0)
    return np.asarray(feature, dtype=np.float64)


def frame_features(candidate: np.ndarray, subset: np.ndarray,
                   all_hand_peaks: Sequence[np.ndarray],
                   model_type: str = "body25") -> np.ndarray:
    """Full per-frame featurizer: pose tables -> [156] vector."""
    circles, _ = get_bodypose(candidate, subset, model_type)
    _, peaks = get_handpose(all_hand_peaks)
    return populate_features(circles, peaks)
