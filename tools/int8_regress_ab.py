"""Isolate the int8 fused-program slowdown (round-3 bench: int8 ~25 fps vs
bf16 ~400 fps at the 184px hand-crop production config; round 2 measured
int8 FASTER at 368px crops).

Times the fused device program interleaved for a grid of configurations:
{bf16, int8-body-only, int8-hand-only, int8-both} x {184px, 368px crops},
fetch-inclusive (the only real timing through the relay — CLAUDE.md).

Run ALONE (one TPU process at a time):  timeout --signal=INT 1800 \
    python tools/int8_regress_ab.py
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

import jax.numpy as jnp


def main():
    import cv2

    from islx.core.config import HandConfig
    from islx.models import cpm, quant
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    B = int(os.environ.get("AB_B", "32"))
    iters = int(os.environ.get("AB_ITERS", "6"))

    img = cv2.imread("/root/reference/images/demo.jpg")
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()

    body = cpm.init_params("body25")
    hand = cpm.init_params("hand")

    cpu0 = jax.local_devices(backend="cpu")[0]
    xcal = frames[:2].astype(np.float32) / 256.0 - 0.5
    with jax.default_device(cpu0):
        qbody = quant.quantize_model(body, "body25", [xcal])
        crop = cv2.resize(frame[:hb, :hb], (184, 184))
        hcal = crop[None].astype(np.float32) / 256.0 - 0.5
        qhand = quant.quantize_model(hand, "hand", [hcal])
    qbody = jax.tree.map(np.asarray, qbody)
    qhand = jax.tree.map(np.asarray, qhand)

    def mk(bp, hp, scale):
        return FusedPosePipeline(
            bp, hp, hand_cfg=HandConfig.production(scale=scale))

    grid = {}
    for scale, tag in [(0.5, "184"), (1.0, "368")]:
        grid[f"bf16_{tag}"] = mk(body, hand, scale)
        grid[f"i8body_{tag}"] = mk(qbody, hand, scale)
        grid[f"i8hand_{tag}"] = mk(body, qhand, scale)
        grid[f"i8both_{tag}"] = mk(qbody, qhand, scale)

    counter = [0]

    def step(p):
        i = counter[0]
        counter[0] += 1
        frames[i % B, (i * 7) % hb, (i * 13) % wb, 0] ^= 1
        return p.device_step(frames, (h0, w0), 1.6)

    def fetch(p, h):
        return p.assemble(h, B)

    # compile + warm all
    for k, p in grid.items():
        t = time.perf_counter()
        fetch(p, step(p))
        print(f"warm {k}: {time.perf_counter() - t:.1f}s", flush=True)

    # interleaved windows: round-robin so ambient drift hits all equally
    res = {k: [] for k in grid}
    for r in range(3):
        for k, p in grid.items():
            t0 = time.perf_counter()
            h = None
            for _ in range(iters):
                nh = step(p)
                if h is not None:
                    fetch(p, h)
                h = nh
            fetch(p, h)
            fps = B * iters / (time.perf_counter() - t0)
            res[k].append(fps)
            print(f"[{r}] {k}: {fps:.1f} fps", flush=True)

    print("\n=== medians ===")
    for k, v in res.items():
        print(f"{k}: {np.median(v):.1f} fps")


if __name__ == "__main__":
    main()
