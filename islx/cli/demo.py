"""Single-image demo: body pose + hand pose + rendering.

Equivalent of reference demo.py / demo_batch.py:

    python -m islx.cli.demo IMAGE [--body-weights W] [--hand-weights W]
           [--model-type body25|coco] [--out OUT.png] [--exact]

Default: production pipelines (two fixed device programs, <=1px vs exact).
--exact: the reference-parity per-image path — compiles one program per image
size AND per hand-crop size, so first-run latency is minutes.
Without weights the nets run randomly initialized (pipeline smoke test).
"""
from __future__ import annotations

import argparse
import glob
import os


def build_pose(args, calib_image=None):
    if not args.exact:
        from islx.core import weights as W
        from islx.pipeline.image import ImagePose

        from islx.cli import gated_hand_cfg, gated_int8_params

        bp = (W.load(args.body_weights, args.model_type)
              if args.body_weights else None)
        hp = W.load(args.hand_weights, "hand") if args.hand_weights else None
        hand_cfg = gated_hand_cfg(args.hand_weights, log=print)
        if bp is not None and hp is not None and calib_image is not None:
            # recorded int8 GO (gates.json) -> W8A8 trunks, calibrated on
            # the demo image itself (cached per checkpoint)
            bp, hp, _ = gated_int8_params(
                bp, hp, model_type=args.model_type,
                hand_weights=args.hand_weights, hand_cfg=hand_cfg,
                calib_image=calib_image, log=print)
        return ImagePose(bp, hp, args.model_type, hand_cfg=hand_cfg)
    from islx.isl.translator import ISLSignPos
    from islx.pose.body import Body
    from islx.pose.hand import Hand

    body = Body(args.body_weights, args.model_type)
    hand = Hand(args.hand_weights)
    return ISLSignPos(body, hand)


def process_image(pose, img, model_type: str):
    from islx.utils import draw

    candidate, subset, hands = pose(img)
    canvas = draw.draw_bodypose(img, candidate, subset, model_type)
    return draw.draw_handpose(canvas, hands), (candidate, subset, hands)


def main(argv=None):
    import cv2

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("images", nargs="+", help="image path(s) or glob")
    p.add_argument("--body-weights", default=None)
    p.add_argument("--hand-weights", default=None)
    p.add_argument("--model-type", default="body25",
                   choices=["body25", "coco"])
    p.add_argument("--out", default=None,
                   help="output path (single image) or directory")
    p.add_argument("--exact", action="store_true",
                   help="reference-parity per-image path (slow first run)")
    args = p.parse_args(argv)

    paths = []
    for pat in args.images:
        paths.extend(sorted(glob.glob(pat)) or [pat])
    # validate inputs BEFORE building models (model build compiles on device)
    readable = {p: cv2.imread(p) for p in paths}
    missing = [p for p, img in readable.items() if img is None]
    for p in missing:
        print(f"cannot read {p}")
    if all(img is None for img in readable.values()):
        raise SystemExit(1)
    pose = build_pose(args, calib_image=next(
        (img for img in readable.values() if img is not None), None))
    for path in paths:
        img = readable[path]
        if img is None:
            continue
        canvas, (candidate, subset, hands) = process_image(
            pose, img, args.model_type)
        if args.out and len(paths) == 1 and not os.path.isdir(args.out):
            out = args.out
        else:
            stem = os.path.splitext(os.path.basename(path))[0]
            out_dir = args.out if args.out else os.path.dirname(path) or "."
            os.makedirs(out_dir, exist_ok=True)
            out = os.path.join(out_dir, f"result_{stem}_{args.model_type}.png")
        cv2.imwrite(out, canvas)
        print(f"{path}: {len(subset)} people, {len(hands)} hands -> {out}")


if __name__ == "__main__":
    main()
