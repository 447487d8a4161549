"""Quantify PARITY.md divergence #6: on-device hand boxes in crowded scenes.

The fused pipeline places hand boxes ON DEVICE by chaining the best-scoring
PAF connections per arm side (islx/ops/hand_boxes.py) instead of reading arms
off the host-grouped subset (reference geometry src/util.py:242-306 applied
after src/body.py:185-231 grouping). For isolated people the two are
equality-tested identical; in multi-person scenes the device chain can (a)
pick a different person's arm than slot order would, or (b) stitch a chimera
arm from two people's joints when their limbs overlap enough that a
cross-person elbow->wrist PAF connection outranks the true ones.

This tool measures that: synthetic two-person scenes with both arms painted
as ground-truth-style PAF fields (unit vectors in a band around each limb,
averaged where limbs overlap — the construction OpenPose trains on), the
exact parity scorer (islx.ops.paf.score_limbs) producing ONE shared
connection table consumed by BOTH paths, so the measured divergence is
purely grouping-vs-chaining:

  host   path: ops.grouping.assemble -> pose.detector.hand_detect
  device path: ops.paf.compact_connections -> ops.hand_boxes.device_hand_boxes

Per scene and side we classify the device box as:
  match    — equals one of the host boxes for that side (a real arm)
  chimera  — a box no host person produced (mixed-person chain)
  miss     — device found nothing where the host found >=1
  extra    — device found a box where the host found none

Run: python tools/handbox_crowd_eval.py  (prints one JSON line per
separation level; `--scenes N --seed S` to change the sample).
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from islx.ops.grouping import assemble  # noqa: E402
from islx.ops.hand_boxes import device_hand_boxes  # noqa: E402
from islx.ops.paf import (LIMB_SEQ_BODY25, MAP_IDX_BODY25,  # noqa: E402
                          compact_connections, score_limbs)
from islx.pose.detector import hand_detect  # noqa: E402

HB, WB = 184, 248
SY = SX = 2.0
NJOINT = 25
K = 16          # peak slots per channel
M = 48          # compact connection slots per limb
P = 52          # body25 PAF channels
# neck->shoulder limbs included so grouped persons carry >=4 parts and
# survive the reference's prune (src/body.py:227-231)
ARM_LIMBS = ((1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7))
_ROWS = {tuple(p): i for i, p in enumerate(LIMB_SEQ_BODY25.tolist())}

_YY, _XX = np.mgrid[0:HB, 0:WB].astype(np.float32)


def _paint_limb(vec_sum: np.ndarray, cnt: np.ndarray, c0: int, c1: int,
                a: np.ndarray, b: np.ndarray, thr: float = 4.0) -> None:
    """Accumulate the limb's unit vector into PAF channels (c0, c1) for every
    pixel within ``thr`` of segment a->b (OpenPose ground-truth PAF shape)."""
    d = b - a
    n = float(np.hypot(*d))
    if n < 1e-3:
        return
    u = d / n
    px, py = _XX - a[0], _YY - a[1]
    t = np.clip((px * u[0] + py * u[1]) / n, 0.0, 1.0)
    dist = np.hypot(px - t * n * u[0], py - t * n * u[1])
    band = dist <= thr
    vec_sum[band, c0] += u[0]
    vec_sum[band, c1] += u[1]
    cnt[band, c0 // 2] += 1


def _person(rng: np.random.RandomState, cx: float, cy: float) -> dict:
    """Random two-arm skeleton around torso center (bucket coords)."""
    sw = rng.uniform(14, 20)
    joints = {1: np.array([cx, cy - rng.uniform(2, 6)]),
              2: np.array([cx - sw, cy]), 5: np.array([cx + sw, cy])}
    for sh, el, wr, sign in ((2, 3, 4, -1.0), (5, 6, 7, 1.0)):
        ua, fa = rng.uniform(22, 32), rng.uniform(20, 30)
        a1 = rng.uniform(0.15, 1.1) * sign    # upper arm angle off vertical
        a2 = a1 + rng.uniform(-0.7, 0.7)      # forearm
        joints[el] = joints[sh] + ua * np.array([np.sin(a1), np.cos(a1)])
        joints[wr] = joints[el] + fa * np.array([np.sin(a2), np.cos(a2)])
    return joints


def make_scene(rng: np.random.RandomState, separation: float):
    """Two people ``separation`` bucket-px apart -> shared scoring inputs.

    Returns (peaks_xy, peaks_score, peaks_count, paf).
    """
    cy = rng.uniform(50, 80)
    cx = rng.uniform(70, 100)
    people = [_person(rng, cx, cy + rng.uniform(-6, 6)),
              _person(rng, cx + separation, cy + rng.uniform(-6, 6))]
    vec_sum = np.zeros((HB, WB, P), np.float32)
    cnt = np.zeros((HB, WB, P // 2), np.int32)
    peaks_xy = np.zeros((NJOINT, K, 2), np.int32)
    peaks_score = np.zeros((NJOINT, K), np.float32)
    peaks_count = np.zeros((NJOINT,), np.int32)
    for pi, joints in enumerate(people):
        for ch, xy in joints.items():
            x = int(np.clip(round(xy[0]), 0, WB - 1))
            y = int(np.clip(round(xy[1]), 0, HB - 1))
            peaks_xy[ch, pi] = (x, y)
            peaks_score[ch, pi] = 0.9
            peaks_count[ch] = pi + 1
        for a, b in ARM_LIMBS:
            c0, c1 = MAP_IDX_BODY25[_ROWS[(a, b)]]
            _paint_limb(vec_sum, cnt, int(c0), int(c1),
                        joints[a], joints[b])
    # average where limbs overlap (ground-truth PAF construction)
    denom = np.maximum(cnt, 1).astype(np.float32)
    paf = vec_sum / np.repeat(denom, 2, axis=2)
    return peaks_xy, peaks_score, peaks_count, paf


def _host_side_boxes(candidate: np.ndarray, subset: np.ndarray):
    """Grouped people -> {is_left: [(bx, by, bw), ...]} in bucket ints with
    the exact detect_hand_boxes mapping (islx/pipeline/batch_pose.py:86)."""
    cand_orig = candidate.copy()
    if cand_orig.shape[0]:
        cand_orig[:, 0] *= SX
        cand_orig[:, 1] *= SY
    out = {True: [], False: []}
    for x, y, w, is_left in hand_detect(cand_orig, subset,
                                        (int(HB * SY), int(WB * SX))):
        bx = min(int(round(x / SX)), WB - 1)
        by = min(int(round(y / SY)), HB - 1)
        bw = max(min(int(round(w / SX)), WB - bx, HB - by), 1)
        out[bool(is_left)].append((bx, by, bw))
    return out


def eval_scene(peaks_xy, peaks_score, peaks_count, paf) -> dict:
    valid = np.arange(K)[None, :] < peaks_count[:, None]
    ls = score_limbs(jnp.asarray(paf), jnp.asarray(peaks_xy),
                     jnp.asarray(valid), jnp.asarray(LIMB_SEQ_BODY25),
                     jnp.asarray(MAP_IDX_BODY25))
    score = np.asarray(ls.score)
    ok = np.asarray(ls.ok)

    candidate, subset = assemble(peaks_xy, peaks_score, peaks_count,
                                 score, ok, LIMB_SEQ_BODY25, NJOINT)
    host = _host_side_boxes(candidate, subset)

    cc = compact_connections(ls, m=M)
    dev = np.asarray(device_hand_boxes(
        jnp.asarray(peaks_xy), cc.pair, cc.score, cc.ok,
        LIMB_SEQ_BODY25, SY, SX, HB, WB))

    counts = dict.fromkeys(("match", "chimera", "miss", "extra", "none"), 0)
    for row, is_left in ((0, True), (1, False)):
        d = tuple(int(v) for v in dev[row])
        hboxes = host[is_left]
        if dev[row, 2] == 0:
            counts["miss" if hboxes else "none"] += 1
        elif d in hboxes:
            counts["match"] += 1
        elif hboxes:
            counts["chimera"] += 1
        else:
            counts["extra"] += 1
    return counts


def evaluate(separations=(80.0, 40.0, 24.0, 12.0), scenes: int = 100,
             seed: int = 0) -> list:
    results = []
    for sep in separations:
        rng = np.random.RandomState(seed)
        total = dict.fromkeys(("match", "chimera", "miss", "extra", "none"), 0)
        for _ in range(scenes):
            for k, v in eval_scene(*make_scene(rng, sep)).items():
                total[k] += v
        sides = 2 * scenes
        results.append({
            "separation_px": sep, "scenes": scenes, "sides": sides,
            **total,
            "chimera_rate": total["chimera"] / sides,
            "match_rate": total["match"] / sides,
        })
    return results


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scenes", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--separations", type=float, nargs="+",
                    default=[80.0, 40.0, 24.0, 12.0])
    args = ap.parse_args()
    for row in evaluate(tuple(args.separations), args.scenes, args.seed):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
