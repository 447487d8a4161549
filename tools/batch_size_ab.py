"""Interleaved batch-size A/B for the fused program through the relay.

Post-184px-crops the device step is ~47ms/B=64 (int8) while the relay adds
~100ms FIXED per fetch + ~70ms upload — so fps is transfer-bound and larger
batches should amortize the fixed fetch toward the upload-bandwidth
asymptote (~0.07MB YUV/frame). This measures B in {64, 96, 128, 192}
interleaved in one process (the only trustworthy A/B through the relay).

Run ALONE:  timeout --signal=INT 2400 python tools/batch_size_ab.py
"""
from __future__ import annotations

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

    from islx.models import cpm
    from islx.ops import yuv
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    sizes = [int(s) for s in
             os.environ.get("AB_SIZES", "64,96,128,192").split(",")]
    iters = int(os.environ.get("AB_ITERS", "8"))

    img = cv2.imread("/root/reference/images/demo.jpg")
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)

    pipe = FusedPosePipeline(cpm.init_params("body25"),
                             cpm.init_params("hand"))

    bufs = {}
    for B in sizes:
        frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()
        bufs[B] = yuv.bgr_to_yuv420_host(frames)

    counter = [0]

    def step(B):
        i = counter[0]
        counter[0] += 1
        buf = bufs[B]
        buf[(i * 131) % buf.shape[0]] ^= 1
        return pipe.device_step_flat(jax.numpy.asarray(buf), B, hb, wb,
                                     (h0, w0), 1.6, input_format="yuv420")

    for B in sizes:
        t = time.perf_counter()
        pipe.assemble(step(B), B)
        print(f"warm B={B}: {time.perf_counter() - t:.1f}s", flush=True)

    res = {B: [] for B in sizes}
    for r in range(4):
        for B in sizes:
            from collections import deque

            q = deque()
            t0 = time.perf_counter()
            for _ in range(iters):
                q.append(step(B))
                if len(q) > 2:
                    pipe.assemble(q.popleft(), B)
            while q:
                pipe.assemble(q.popleft(), B)
            fps = B * iters / (time.perf_counter() - t0)
            res[B].append(fps)
            print(f"[{r}] B={B}: {fps:.1f} fps", flush=True)

    print("\n=== medians ===")
    for B, v in res.items():
        print(f"B={B}: {np.median(v):.1f} fps")


if __name__ == "__main__":
    main()
