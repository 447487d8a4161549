"""Benchmark: body25 + hand end-to-end frames/sec on one chip.

Workload (production config, BASELINE.md configs 1-4 family): every frame runs
the BODY_25 pipeline (bucketed scale-0.5 input, device NMS + PAF scoring +
device-sorted connection compaction, host greedy grouping) plus TWO hand
crops through the hand CPM pipeline (368px crops, single-scale production
pyramid with coarse-to-fine peak refinement; the reference-compat 4-scale
pyramid is a config flip). Weights are random (the reference ships none) —
FLOPs and memory traffic are identical to converted checkpoints.

Both device programs are dispatched asynchronously before either result is
fetched, so body/hand compute and host grouping overlap.

Prints one JSON line: frames/sec/chip vs the 2000 fps north star
(BASELINE.json)."""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import cv2

    from islx.core.config import HandConfig, PoseConfig
    from islx.models import cpm
    from islx.ops import grouping
    from islx.pipeline.batch_pose import (BatchedBodyPipeline,
                                          BatchedHandPipeline, bucket_for)

    B = 16                     # frames per device step
    HANDS_PER_FRAME = 2

    img = cv2.imread("/root/reference/images/demo.jpg")
    if img is None:
        img = (np.random.RandomState(0).rand(512, 384, 3) * 255).astype(np.uint8)
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()
    crop = cv2.resize(img[: min(h0, w0), : min(h0, w0)], (368, 368))
    crops = np.broadcast_to(crop, (B * HANDS_PER_FRAME, 368, 368, 3)).copy()

    body = BatchedBodyPipeline(
        cpm.init_params("body25"), "body25",
        PoseConfig(model_type="body25", max_peaks=16),
        compute_dtype=jnp.bfloat16)
    hand = BatchedHandPipeline(
        cpm.init_params("hand"), HandConfig(scale_search=(1.0,)),
        crop_size=368, compute_dtype=jnp.bfloat16)

    # Random weights produce noise heatmaps that saturate the peak tables and
    # make the (tiny, input-dependent) host grouping step look like the whole
    # workload. Calibrate thre1 so the peak density matches real scenes
    # (a few peaks/joint); device-side work is threshold-independent.
    thre1 = 0.1
    for _ in range(24):
        packed = body.device_step(frames, thre1)
        _, _, count, _, _, _ = body.unpack(packed, B)
        if float(count.mean()) <= 4.0:
            break
        thre1 *= 2.0

    hand_prog = hand._program(B * HANDS_PER_FRAME)
    crops_flat_np = crops.reshape(-1)

    def run_once():
        # dispatch both device programs before fetching anything
        body_packed = body.device_step(frames, thre1)
        hand_packed = hand_prog(hand.params, jnp.asarray(crops_flat_np))
        xy, score, count, pair, cscore, cok = body.unpack(body_packed, B)
        out = []
        for i in range(B):
            out.append(grouping.assemble_sorted(
                xy[i], score[i], count[i], pair[i], cscore[i], cok[i],
                body.cfg.max_peaks, body.limb_seq, body.cfg.njoint))
        hand_res = np.asarray(hand_packed)
        return out, hand_res

    run_once()  # compile + warm

    n_iters = 4
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run_once()
    dt = time.perf_counter() - t0

    fps = B * n_iters / dt
    print(json.dumps({
        "metric": "body25_hand_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
