"""Video annotation demo: batched body+hand over a video file.

Equivalent of reference demo_video.py, but frame-batched: frames stream
through ONE fused device program per batch (body CPM -> on-device hand-box
placement -> hand CPM; islx.pipeline.batch_pose.FusedPosePipeline) — one
upload and one packed fetch per batch, no per-crop-size compiles (the
reference runs one Hand() call per detected crop, demo_video.py:121-140).

    python -m islx.cli.demo_video VIDEO [--out OUT.mp4] [--batch 16]
           [--body-weights W] [--hand-weights W] [--per-frame]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    import cv2

    from islx.core.config import PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import (BatchedBodyPipeline,
                                          FusedPosePipeline, bucket_for)
    from islx.pipeline.video import FrameSource, FrameWriter, Prefetcher
    from islx.pose.body import Body
    from islx.pose.hand import Hand
    from islx.utils import draw

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("video")
    p.add_argument("--out", default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--body-weights", default=None)
    p.add_argument("--hand-weights", default=None)
    p.add_argument("--model-type", default="body25",
                   choices=["body25", "coco"])
    p.add_argument("--per-frame", action="store_true",
                   help="use the reference-exact per-frame path instead of "
                        "the batched production pipeline")
    p.add_argument("--no-hands", action="store_true")
    args = p.parse_args(argv)

    out_path = args.out or (args.video + ".annotated.mp4")

    with FrameSource(args.video) as src:
        meta = src.meta
        writer = FrameWriter(out_path, meta.fps, (meta.height, meta.width))
        n_done = 0
        if args.per_frame:
            hand = None if args.no_hands else Hand(args.hand_weights)
            body = Body(args.body_weights, args.model_type)
            for frame in src:
                candidate, subset = body(frame)
                canvas = draw.draw_bodypose(frame, candidate, subset,
                                            args.model_type)
                canvas = _annotate_hands(canvas, frame, candidate, subset,
                                         hand)
                writer(canvas)
                n_done += 1
        else:
            from islx.core import weights as W

            body_params = (cpm.init_params(args.model_type)
                           if args.body_weights is None
                           else W.load(args.body_weights, args.model_type))
            pose_cfg = PoseConfig(model_type=args.model_type, max_peaks=16)
            if args.no_hands:
                pipe = BatchedBodyPipeline(body_params, args.model_type,
                                           pose_cfg)
            else:
                hand_params = (cpm.init_params("hand")
                               if args.hand_weights is None
                               else W.load(args.hand_weights, "hand"))
                # body + on-device hand boxes + hand CPM in one program:
                # one upload, one fetch per batch
                from islx.cli import gated_hand_cfg, gated_int8_params

                hand_cfg = gated_hand_cfg(args.hand_weights, log=print)
                if args.body_weights and args.hand_weights:
                    # recorded int8 GO (gates.json) -> W8A8 trunks,
                    # calibrated on the head of this clip
                    body_params, hand_params, _ = gated_int8_params(
                        body_params, hand_params,
                        model_type=args.model_type,
                        hand_weights=args.hand_weights, hand_cfg=hand_cfg,
                        calib_clip=args.video, log=print)
                pipe = FusedPosePipeline(
                    body_params, hand_params, args.model_type, pose_cfg,
                    hand_cfg=hand_cfg)
            hb, wb = bucket_for(meta.height, meta.width)
            sy, sx = meta.height / hb, meta.width / wb

            def batches():
                """Decode + bucket-resize in the prefetch thread: yields
                (bucketed [B,hb,wb,3], raw frames, n_valid)."""
                raw = []
                for f in src:
                    raw.append(f)
                    if len(raw) == args.batch:
                        yield _bucket_batch(raw, hb, wb, args.batch), raw, \
                            len(raw)
                        raw = []
                if raw:
                    yield _bucket_batch(raw, hb, wb, args.batch), raw, \
                        len(raw)

            def annotate(packed, raw, n_valid):
                nonlocal n_done
                if args.no_hands:
                    results = pipe.assemble(packed, args.batch)
                    boxes = peaks = None
                else:
                    results, boxes, peaks = pipe.assemble(packed, args.batch)
                for i in range(n_valid):
                    candidate, subset = results[i]
                    if candidate.shape[0]:
                        candidate[:, 0] *= sx
                        candidate[:, 1] *= sy
                    canvas = draw.draw_bodypose(raw[i], candidate, subset,
                                                args.model_type)
                    if peaks is not None:
                        canvas = draw.draw_handpose(
                            canvas, pipe.hands_for_frame(boxes, peaks, i,
                                                         sy, sx))
                    writer(canvas)
                    n_done += 1

            def dispatch(batch):
                flat = pipe.upload_frames(batch)
                if args.no_hands:
                    return pipe.device_step_flat(flat, args.batch, hb, wb)
                return pipe.device_step_flat(flat, args.batch, hb, wb,
                                             (meta.height, meta.width))

            # double-buffered: decode/resize runs in a prefetch thread,
            # batch i+1's device program is dispatched before batch i's
            # results are fetched/annotated (the bench.py overlap pattern,
            # on the user-facing surface)
            pending = None
            for batch, raw, n_valid in Prefetcher(batches(), depth=2):
                packed = dispatch(batch)
                if pending is not None:
                    annotate(*pending)
                pending = (packed, raw, n_valid)
            if pending is not None:
                annotate(*pending)
        writer.close()
    print(f"annotated {n_done} frames -> {out_path}")


def _bucket_batch(raw, hb: int, wb: int, batch: int) -> np.ndarray:
    """Raw frames -> fixed [batch,hb,wb,3] bucket (tail repeats last frame)."""
    import cv2

    buf = [cv2.resize(f, (wb, hb), interpolation=cv2.INTER_CUBIC)
           for f in raw]
    while len(buf) < batch:
        buf.append(buf[-1])
    return np.stack(buf)


def _annotate_hands(canvas, frame, candidate, subset, hand):
    if hand is None or len(subset) == 0:
        return canvas
    from islx.pose.detector import hand_detect
    from islx.utils import draw

    peaks_all = []
    for x, y, w, _ in hand_detect(candidate, subset, frame.shape):
        peaks = hand(frame[y:y + w, x:x + w, :]).astype(np.int64)
        peaks[:, 0] = np.where(peaks[:, 0] == 0, 0, peaks[:, 0] + x)
        peaks[:, 1] = np.where(peaks[:, 1] == 0, 0, peaks[:, 1] + y)
        peaks_all.append(peaks)
    return draw.draw_handpose(canvas, peaks_all)


if __name__ == "__main__":
    main()
