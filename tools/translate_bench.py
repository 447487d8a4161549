"""Config-5 benchmark: full ISL translate end-to-end, frames/sec.

BASELINE.md config 5 ("full ISL translate: ISL_extract_features_videos ->
sign classifier end-to-end"). The reference implementation of this path
re-runs 20 full pose stacks per emitted prediction with per-scale device
round trips (/root/reference/src/ISL_Model_parameter.py:322-353, SURVEY.md
§3.3) and was never benchmarked by its authors. islx's production config-5
pipeline (islx.pipeline.translate.BatchedTranslatePipeline) runs ONE fused
device program per batch of frames, caches per-frame features, and batches
the rolling windows through the BiLSTM head — this tool measures it
fetch-inclusive on a synthetic clip.

Weights are random (the reference ships none): pose FLOPs/bytes equal the
converted checkpoints, and thre1 is calibrated bench-style so the host
grouping/featurization load matches realistic peak density.

Run ALONE (one TPU process at a time):
    timeout --signal=INT 1200 python tools/translate_bench.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import cv2

    from islx.pipeline.batch_pose import bucket_for
    from islx.pipeline.translate import BatchedTranslatePipeline

    if os.environ.get("ISLX_TB_CPU"):
        jax.config.update("jax_platforms", "cpu")

    B = int(os.environ.get("ISLX_TB_BATCH", "64"))
    N = int(os.environ.get("ISLX_TB_FRAMES", str(B * 8)))
    reps = int(os.environ.get("ISLX_TB_REPS", "3"))

    img = cv2.imread("/root/reference/images/demo.jpg")
    if img is None:
        img = (np.random.RandomState(0).rand(512, 384, 3) * 255
               ).astype(np.uint8)
    h0, w0 = img.shape[:2]
    # a synthetic "clip": every frame distinct (defeats relay execution
    # memoization), source-resolution input so the measurement includes the
    # host bucketing/prefetch stage of the real video path
    frames = [np.roll(img, 3 * i, axis=1) for i in range(N)]

    tp = BatchedTranslatePipeline(batch=B)

    # thre1 calibration (bench.py's recipe): random-weight heatmaps are
    # noise; raise the threshold until peak density matches real scenes so
    # host grouping isn't benchmarked at saturation
    hb, wb = bucket_for(h0, w0, target_h=184)
    fb = np.broadcast_to(cv2.resize(img, (wb, hb),
                                    interpolation=cv2.INTER_CUBIC),
                         (B, hb, wb, 3)).copy()
    t1 = 0.1
    print(f"[tb] compiling fused program (B={B}) ...", file=sys.stderr,
          flush=True)
    for _ in range(24):
        packed = tp.pipe.device_step(fb, (h0, w0), t1)
        body_view, _, _ = tp.pipe.unpack(packed, B)
        _, _, count, _, _, _ = tp.pipe.body.unpack(body_view, B)
        if float(count.mean()) <= 4.0:
            break
        t1 *= 2.0
    tp.thre1 = t1
    print(f"[tb] thre1 calibrated to {t1}", file=sys.stderr, flush=True)

    # ISLX_TB_YUV=1: measure the PRODUCTION ingest (translate_video auto-
    # selects I420 when ffmpeg exists): bucketed flat I420 buffers uploaded
    # at 1.5 bytes/px with BT.601->BGR on device. The pre-conversion below
    # stands in for ffmpeg's native I420 output (not a timed cost).
    use_yuv = os.environ.get("ISLX_TB_YUV", "0") == "1"
    if use_yuv:
        from islx.ops import yuv

        bucketed = np.stack([cv2.resize(f, (wb, hb),
                                        interpolation=cv2.INTER_CUBIC)
                             for f in frames])
        flat_all = yuv.bgr_to_yuv420_host(bucketed)
        step = yuv.frame_bytes(hb, wb)
        flat_frames = [flat_all[i * step:(i + 1) * step] for i in range(N)]

        def run(fs):
            return tp.translate_yuv_frames(iter(fs), (h0, w0), (hb, wb))

        clip = flat_frames
    else:
        def run(fs):
            return tp.translate_frames(iter(fs))

        clip = frames

    # warm-up (head compile + ambient throwaway)
    run(clip[: 2 * B])

    prof = os.environ.get("ISLX_TB_PROF", "0") == "1"
    fps_reps = []
    n_preds = 0
    stage_split = None
    for r in range(reps):
        if prof:
            tp.prof = {}
        t0 = time.perf_counter()
        preds = run(clip)
        dt = time.perf_counter() - t0
        fps_reps.append(N / dt)
        n_preds = len(preds)
        print(f"[tb] rep {r}: {fps_reps[-1]:.1f} frames/s "
              f"({n_preds} predictions)", file=sys.stderr, flush=True)
        if prof:
            acc = sum(tp.prof.values())
            stage_split = {k: round(v, 3) for k, v in tp.prof.items()}
            stage_split["other_host"] = round(dt - acc, 3)
            stage_split["wall"] = round(dt, 3)
            print(f"[tb] stage split (s): {stage_split}", file=sys.stderr,
                  flush=True)

    fps = float(np.median(fps_reps))
    print(json.dumps({
        "metric": "isl_translate_e2e_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "config": "BASELINE.md config 5 (video -> pose -> 156-d features "
                  "-> 20-frame windows -> BiLSTM -> expression)",
        "batch": B, "frames": N, "predictions_per_run": n_preds,
        "reps": [round(x, 2) for x in fps_reps],
        "ingest": "yuv420" if use_yuv else "bgr",
        **({"stage_split_s": stage_split} if stage_split else {}),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
