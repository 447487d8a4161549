"""Hand-pyramid scale quality evaluation (weights-gated).

The production hand path runs a single-scale pyramid at ``scale*368`` px
(HandConfig.scale_search). The fused pipeline's crops carry at most ~64px of
bucket content, so `scale_search=(0.5,)` (184px net input) would cut the
hand CPM's FLOPs 4x — IF the trained net tolerates hands at half its
training scale (the reference hedges with a 4-scale average,
/root/reference/src/hand.py:25). That is an empirical question that needs
real checkpoints, which this environment does not ship (model/ is
download-only upstream).

This tool answers it the moment weights exist:

    ISLX_WEIGHTS_DIR=/path/to/weights python tools/hand_scale_eval.py \
        [--images /root/reference/images] [--crops-per-image 8]

For every hand crop detected on the reference demo images it runs the hand
CPM at scales (0.5,), (1.0,) and the reference 4-scale pyramid, and reports
mean/max keypoint L2 of each fast config against the 4-scale reference
peaks. A mean L2 < 1px for (0.5,) justifies flipping the production
default and roughly doubles the end-to-end fps ceiling (BENCH_NOTES.md).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# accuracy evaluation, not a perf tool: force CPU so it can never collide
# with a TPU process on the one-process-at-a-time relay (CLAUDE.md);
# ISLX_EVAL_TPU=1 opts into device execution
if not os.environ.get("ISLX_EVAL_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def find_hand_gt(wdir: str):
    """Path of a ground-truth hand-scene sidecar next to the weights
    (tools/make_synthetic_weights.write_hand_gt), or None."""
    for rel in (os.path.join("scenes", "hand_gt.json"), "hand_gt.json"):
        q = os.path.join(wdir, rel)
        if wdir and os.path.exists(q):
            return q
    return None


def find_weights(wdir: str):
    """-> (body25_path, hand_path), either may be None."""
    body_w = hand_w = None
    for n in ("pose_iter_584000.caffemodel.pt", "body25.npz"):
        q = os.path.join(wdir, n)
        if wdir and os.path.exists(q):
            body_w = q
            break
    for n in ("hand_pose_model.pth", "hand.npz"):
        q = os.path.join(wdir, n)
        if wdir and os.path.exists(q):
            hand_w = q
            break
    return body_w, hand_w


CONFIG_KEYS = ("single_368", "single_184", "s5_184", "s4_184",
               "single_160", "s5_160")


def _hand_configs(hp):
    """The gated production candidates, one Hand API instance each."""
    from islx.core.config import HandConfig
    from islx.pose.hand import Hand

    return {
        "ref_4scale": Hand(hp, HandConfig()),
        "single_368": Hand(hp, HandConfig(scale_search=(1.0,))),
        "single_184": Hand(hp, HandConfig(scale_search=(0.5,))),
        # CPM stage trim (HandConfig.stages; reference consumes only the
        # final stage's heatmap, src/model.py:394-407): each trimmed stage
        # cuts ~2.3 GFLOP/184px-crop — GO when its drift stays <1px
        "s5_184": Hand(hp, HandConfig(scale_search=(0.5,), stages=5)),
        "s4_184": Hand(hp, HandConfig(scale_search=(0.5,), stages=4)),
        # 160px crops: measured 2203 fps/chip on-device with all 6 stages
        # (tools/tpu_validate.py trimspan) — the single biggest gated cut
        "single_160": Hand(hp, HandConfig(scale_search=(160 / 368,))),
        "s5_160": Hand(hp, HandConfig(scale_search=(160 / 368,), stages=5)),
    }


def evaluate_gt(hand_w: str, gt_path: str, include_ref: bool = True):
    """-> {config: {"mean","p95","max","n","found"} | None} keypoint-L2 of
    every config vs GROUND-TRUTH joints (the synthetic scene generator
    renders the hands, so it knows every joint position).

    This instrument is discriminative even when pyramid-consistency is not:
    a scale-inconsistent checkpoint fails every config identically against
    its own pyramid (the round-4 bundle's single_368 drifted 113.9px vs its
    own 4-scale average — VERDICT r4 weak #2), but against GT each config's
    accuracy is measured independently, so the GO decision can compare the
    fast configs' DELTA vs the single_368 baseline. "found" = fraction of
    visible GT joints the config detected (nonzero peak)."""
    import json

    import cv2

    from islx.core import weights as W

    with open(gt_path) as f:
        gt = json.load(f)
    base_dir = os.path.dirname(gt_path)
    hands = _hand_configs(W.load(hand_w, "hand"))
    if not include_ref:
        # the 4-scale pyramid is ~40% of the eval cost (a 736px leg per
        # scene) and no GT verdict consumes it — droppable when time-boxed
        hands.pop("ref_4scale")
    # per-(scene, joint) L2 keyed rows: enables PAIRED config deltas below
    per = {k: {"l2": {}, "vis": 0} for k in hands}
    n_scenes = 0
    for si, e in enumerate(gt["entries"]):
        img = cv2.imread(os.path.join(base_dir, e["file"]))
        if img is None:
            continue
        n_scenes += 1
        kp = np.asarray(e["kp"], np.float64)
        vis = np.asarray(e["vis"], bool)
        for k, h in hands.items():
            got = np.asarray(h(img), np.float64)
            per[k]["vis"] += int(vis.sum())
            for j in range(kp.shape[0]):
                if vis[j] and (got[j] != 0).any():
                    per[k]["l2"][(si, j)] = float(
                        np.linalg.norm(got[j] - kp[j]))
    if n_scenes == 0:
        raise RuntimeError(f"no readable GT scenes next to {gt_path}")
    out = {"n_scenes": n_scenes}
    for k, d in per.items():
        l2 = np.asarray(list(d["l2"].values()))
        out[k] = None if l2.size == 0 else {
            "mean": float(l2.mean()),
            "median": float(np.median(l2)),
            "p95": float(np.percentile(l2, 95)),
            "max": float(l2.max()), "n": int(l2.size),
            "found": round(len(d["l2"]) / max(d["vis"], 1), 4)}
    # paired deltas vs the single_368 baseline: every config is scored on
    # the SAME (scene, joint) set, so the hard-scene misdetection tail
    # (present in every config) cancels and the delta's standard error —
    # not the baseline's absolute accuracy — bounds what the instrument can
    # resolve against the 1px gate
    base = per["single_368"]["l2"]
    paired = {}
    for k, d in per.items():
        if k == "single_368":
            continue
        keys = sorted(set(base) & set(d["l2"]))
        if not keys:
            paired[k] = None
            continue
        dd = np.asarray([d["l2"][q] - base[q] for q in keys])
        paired[k] = {"mean_delta": float(dd.mean()),
                     "median_delta": float(np.median(dd)),
                     "se": float(dd.std() / np.sqrt(dd.size)),
                     "n": int(dd.size)}
    out["paired"] = paired
    return out


def evaluate(body_w: str, hand_w: str, images: str = "/root/reference/images",
             crops_per_image: int = 8):
    """-> {config: {"mean": .., "p95": .., "max": .., "n": ..} | None}
    keypoint-L2 stats of each single-scale config vs the 4-scale reference
    pyramid (None = no matched keypoints: config unusable)."""
    import cv2

    from islx.core import weights as W
    from islx.pose.body import Body
    from islx.pose.detector import hand_detect

    body = Body(W.load(body_w, "body25"), "body25")
    hands = _hand_configs(W.load(hand_w, "hand"))

    crops = []
    for path in sorted(glob.glob(os.path.join(images, "*.jpg"))):
        img = cv2.imread(path)
        if img is None:
            continue
        candidate, subset = body(img)
        for x, y, w, _ in hand_detect(candidate, subset, img.shape)[
                :crops_per_image]:
            # canonicalize the crop size: the Hand pyramid resizes every
            # crop to scale*368 internally anyway, and distinct outer sizes
            # would each compile their own program (minutes per config)
            crop = cv2.resize(img[y:y + w, x:x + w], (368, 368),
                              interpolation=cv2.INTER_CUBIC)
            crops.append((os.path.basename(path), crop))
    if not crops:
        raise RuntimeError(f"no hand crops detected on {images}")

    peaks = {k: [np.asarray(h(c), np.float64) for _, c in crops]
             for k, h in hands.items()}
    out = {"n_crops": len(crops)}
    for k in CONFIG_KEYS:
        l2 = []
        for ref, got in zip(peaks["ref_4scale"], peaks[k]):
            both = (ref != 0).any(-1) & (got != 0).any(-1)
            if both.any():
                l2.extend(np.linalg.norm(ref[both] - got[both], axis=-1))
        l2 = np.asarray(l2)
        # None = the decisive negative result: the fast config found nothing
        # the reference found (config unusable at this scale)
        out[k] = None if l2.size == 0 else {
            "mean": float(l2.mean()),
            "p95": float(np.percentile(l2, 95)),
            "max": float(l2.max()), "n": int(l2.size)}
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", default="/root/reference/images")
    p.add_argument("--crops-per-image", type=int, default=8)
    args = p.parse_args(argv)

    wdir = os.environ.get("ISLX_WEIGHTS_DIR", "")
    body_w, hand_w = find_weights(wdir)
    if not (body_w and hand_w):
        print("SKIP: set ISLX_WEIGHTS_DIR to a directory with downloaded "
              "reference checkpoints (body25 + hand)")
        return 0
    gt_path = find_hand_gt(wdir)
    if gt_path:
        res = evaluate_gt(hand_w, gt_path)
        print(f"GROUND-TRUTH instrument: {res['n_scenes']} scenes from "
              f"{gt_path}")
        paired = res.get("paired", {})
        for k in ("ref_4scale",) + CONFIG_KEYS:
            s = res[k]
            if s is None:
                print(f"{k}: found NO visible GT joints (config unusable)")
                continue
            p = paired.get(k)
            delta = ("" if not p else
                     f"  paired-delta-vs-368 {p['mean_delta']:+.2f}px "
                     f"(se {p['se']:.2f})")
            print(f"{k}: mean L2 {s['mean']:.2f}px  median "
                  f"{s['median']:.2f}px  p95 {s['p95']:.2f}px  "
                  f"max {s['max']:.2f}px  found {s['found']:.0%}  "
                  f"(n={s['n']}){delta}")
        return 0
    res = evaluate(body_w, hand_w, args.images, args.crops_per_image)
    print(f"{res['n_crops']} crops from {args.images}")
    for k in CONFIG_KEYS:
        s = res[k]
        if s is None:
            print(f"{k}: NO matched keypoints vs ref_4scale "
                  f"(config unusable at this scale)")
        else:
            print(f"{k}: mean L2 {s['mean']:.2f}px  p95 {s['p95']:.2f}px"
                  f"  max {s['max']:.2f}px  ({s['n']} matched keypoints)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
