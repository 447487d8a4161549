"""Offline int8 (W8A8) quantization: calibrate on a clip, ship a pytree.

    python -m islx.cli.quantize WEIGHTS OUT --model-type body25|coco|hand
           --calib CLIP.mp4 [--frames 8]

Loads float weights (.pt/.npz/.caffemodel), samples ``--frames`` evenly
spaced frames from the calibration clip, preprocesses them exactly like the
production pipeline (184-bucket for body models, 368-square for the hand
net, /256-0.5), records per-conv activation scales and writes the
quantized pytree to OUT (a checkpoint directory). Every CLI then accepts
OUT wherever it accepts weights:

    python -m islx.cli.demo_video clip.mp4 --body-weights OUT_body --hand-weights OUT_hand

v5e runs the int8 trunks at ~1.8x the bf16 conv rate (+27% measured
end-to-end, docs/PERFORMANCE.md). Validate accuracy on your workload —
tools/hand_scale_eval.py shows the pattern.
"""
from __future__ import annotations

import argparse

import numpy as np


def sample_calibration_inputs(clip: str, model_type: str,
                              n_frames: int = 8) -> np.ndarray:
    """-> normalized net inputs [n,H,W,3] f32 from evenly spaced frames."""
    import cv2

    from islx.pipeline.batch_pose import bucket_for
    from islx.pipeline.video import FrameSource

    # bounded-memory stride sampling: keep at most 2*n_frames decoded
    # frames; when full, halve the kept set and double the stride (a long
    # clip never lives in memory all at once)
    picked: list = []
    stride = 1
    with FrameSource(clip) as src:
        for i, f in enumerate(src):
            if i % stride == 0:
                picked.append(f)
                if len(picked) > 2 * n_frames:
                    picked = picked[::2]
                    stride *= 2
    if not picked:
        raise SystemExit(f"no frames decoded from {clip}")
    step = max(len(picked) // n_frames, 1)
    picked = picked[::step][:n_frames]
    h0, w0 = picked[0].shape[:2]
    if model_type == "hand":
        size = 368
        out = [cv2.resize(f, (size, size), interpolation=cv2.INTER_CUBIC)
               for f in picked]
    else:
        hb, wb = bucket_for(h0, w0, target_h=184)
        out = [cv2.resize(f, (wb, hb), interpolation=cv2.INTER_CUBIC)
               for f in picked]
    return np.stack(out).astype(np.float32) / 256.0 - 0.5


def main(argv=None):
    from islx.core import checkpoint as C
    from islx.core import weights as W
    from islx.models import cpm, quant

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("weights")
    p.add_argument("out")
    p.add_argument("--model-type", required=True,
                   choices=["body25", "coco", "hand"])
    p.add_argument("--calib", required=True,
                   help="video clip to calibrate activation scales on")
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args(argv)

    params = W.load(args.weights, args.model_type)
    xcal = sample_calibration_inputs(args.calib, args.model_type,
                                     args.frames)
    qparams = quant.quantize_model(params, args.model_type, [xcal])
    C.save_pytree(args.out, qparams)
    n_q = sum(1 for e in qparams.values() if "w_q" in e)
    print(f"quantized {n_q}/{len(cpm.conv_layers(args.model_type))} conv "
          f"layers -> {args.out}")


if __name__ == "__main__":
    main()
