"""ISL translation demo: video -> rolling-window sign predictions.

Equivalent of reference demo_isl_translate.py /
demo_isl_translate_one_model.py, with per-frame feature caching (each frame's
pose runs once, not 20x — see islx.isl.translator).

    python -m islx.cli.translate VIDEO [--head model.keras|.npz]
           [--body-weights W] [--hand-weights W] [--camera]
"""
from __future__ import annotations

import argparse


def load_head(path):
    from islx.models import translator as T

    if path is None:
        return None
    if path.endswith((".keras", ".h5")):
        return T.load_keras(path)
    if path.endswith(".npz"):
        return T.load_npz(path)
    raise ValueError(f"unsupported head checkpoint: {path}")


def main(argv=None):
    from islx.isl.translator import ISLTranslator
    from islx.pose.body import Body
    from islx.pose.hand import Hand

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("video", nargs="?", default=None)
    p.add_argument("--camera", action="store_true",
                   help="use webcam instead of a file (demo_camera.py flow)")
    p.add_argument("--head", default=None,
                   help="translator head checkpoint (.keras/.h5/.npz)")
    p.add_argument("--bundle", default=None,
                   help="translator bundle: orbax dir OR a portable .keras/"
                        ".h5 one-model artifact (body+hand+head in one — "
                        "the reference demo_isl_translate_one_model.py "
                        "flow; export via islx.cli.train --keras-bundle)")
    p.add_argument("--body-weights", default=None)
    p.add_argument("--hand-weights", default=None)
    p.add_argument("--min-prob", type=float, default=0.0)
    p.add_argument("--batched", action="store_true",
                   help="use the batched production pipeline "
                        "(islx.pipeline.translate) instead of the "
                        "reference-exact per-frame path")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--mesh-data", type=int, default=0, metavar="N",
                   help="shard each device batch over N devices (jax data-"
                        "parallel mesh; requires --batched and --batch "
                        "divisible by N; 0 = single device). TPU-native "
                        "equivalent of the reference's process-level DP "
                        "(extract_features_mp.py:198-221).")
    args = p.parse_args(argv)

    if args.mesh_data and not args.batched:
        p.error("--mesh-data requires --batched (the fused device pipeline)")

    if not args.camera:
        import os

        if args.video is None:
            p.error("VIDEO is required unless --camera is given")
        if not os.path.exists(args.video):
            p.error(f"no such video: {args.video}")

    body_params = hand_params = None
    head_params = load_head(args.head)
    model_type = "body25"
    if args.bundle and args.bundle.endswith((".keras", ".h5")):
        # portable single-artifact translator (islx.models.one_model — the
        # reference's demo_isl_translate_one_model.py flow)
        from islx.models import one_model

        body_params, hand_params, head_params = \
            one_model.import_one_model(args.bundle)
    elif args.bundle:
        from islx.core import checkpoint as ckpt

        body_params, hand_params, head_params, model_type = \
            ckpt.load_bundle(args.bundle)

    if args.batched and not args.camera:
        from islx.core import weights as W
        from islx.pipeline.translate import BatchedTranslatePipeline

        mesh = None
        if args.mesh_data:
            from islx.parallel.mesh import make_mesh

            mesh = make_mesh(n_data=args.mesh_data)
        from islx.cli import gated_hand_cfg, gated_int8_params

        bp = (body_params if body_params is not None
              else (W.load(args.body_weights, "body25")
                    if args.body_weights else None))
        hp = (hand_params if hand_params is not None
              else (W.load(args.hand_weights, "hand")
                    if args.hand_weights else None))
        hand_cfg = gated_hand_cfg(args.hand_weights, log=print)
        if bp is not None and hp is not None:
            # recorded int8 GO (gates.json) -> W8A8 trunks, calibrated on
            # the head of this very clip (cached per checkpoint)
            bp, hp, _ = gated_int8_params(
                bp, hp, hand_weights=args.hand_weights, hand_cfg=hand_cfg,
                calib_clip=args.video, log=print)
        pipe = BatchedTranslatePipeline(
            body_params=bp, hand_params=hp,
            head_params=head_params,
            hand_cfg=hand_cfg,
            batch=args.batch,
            mesh=mesh)
        for idx, cid, expr, prob in pipe.translate_video(args.video):
            if prob >= args.min_prob:
                print(f"{idx} {prob:0.4f} {cid}-{expr}")
        return

    body = Body(body_params if body_params is not None
                else args.body_weights, model_type)
    hand = Hand(hand_params if hand_params is not None
                else args.hand_weights)
    translator = ISLTranslator(body, hand, head_params)

    if args.camera:
        import cv2

        cap = cv2.VideoCapture(0)
        idx = 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                probs = translator.push(frame)
                if probs is not None:
                    cid, expr, prob = translator.top_expression(probs)
                    if prob >= args.min_prob:
                        print(f"{idx} {prob:0.4f} {cid}-{expr}")
                idx += 1
        finally:
            cap.release()
        return

    from islx.pipeline.video import FrameSource

    with FrameSource(args.video) as src:
        for idx, cid, expr, prob in translator.translate_video_frames(src):
            if prob >= args.min_prob:
                print(f"{idx} {prob:0.4f} {cid}-{expr}")


if __name__ == "__main__":
    main()
