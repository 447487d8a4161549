"""On-device YUV420 (I420) -> BGR conversion.

Video decoders emit YUV 4:2:0 natively; the reference converts to BGR on the
host and moves 3 bytes/px to the device (demo_video.py:121-140 per-frame BGR
reads). Uploading the I420 planes instead moves 1.5 bytes/px — half the
host->device traffic, which matters once the device programs outrun the
transfer link (docs/PERFORMANCE.md "transfer war") — and the colorspace
conversion becomes a few cheap VPU elementwise ops fused into the same
program as the CPM convs.

Math matches OpenCV's ``COLOR_YUV2BGR_I420`` (ITU-R BT.601 video-range
coefficients, 2x2 chroma replication, saturating cast); the tests pin
agreement with cv2 to <=1 LSB.
"""
from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.601 video-range coefficients as OpenCV applies them
# (modules/imgproc/src/color_yuv.simd.hpp: ITUR_BT_601_CY/CVR/CVG/CUG/CUB,
# 20-bit fixed point)
_CY = 1220542 / (1 << 20)   # 1.16389
_CVR = 1673527 / (1 << 20)  # 1.59603
_CVG = -852492 / (1 << 20)  # -0.81300
_CUG = -409993 / (1 << 20)  # -0.39100
_CUB = 2116026 / (1 << 20)  # 2.01800


def frame_bytes(h: int, w: int) -> int:
    """I420 bytes per frame (h, w must be even)."""
    return h * w * 3 // 2


def yuv420_to_bgr(flat: jnp.ndarray, b: int, h: int, w: int) -> jnp.ndarray:
    """Flat u8 I420 buffer [b * h*w*3/2] -> f32 BGR frames [b,h,w,3].

    Layout per frame: Y plane [h,w], U plane [h/2,w/2], V plane [h/2,w/2]
    (exactly cv2.COLOR_BGR2YUV_I420 / ffmpeg ``-pix_fmt yuv420p`` order).
    Output values are rounded and clipped to [0, 255] so downstream
    ``x/256-0.5`` normalization sees the same quantization as a u8 upload.
    """
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    n = h * w
    q = n // 4
    per = n + 2 * q
    planes = flat.reshape(b, per)
    y = planes[:, :n].reshape(b, h, w).astype(jnp.float32)
    u = planes[:, n:n + q].reshape(b, h // 2, w // 2).astype(jnp.float32)
    v = planes[:, n + q:].reshape(b, h // 2, w // 2).astype(jnp.float32)

    # 2x2 chroma replication (cv2's I420 path does not interpolate)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    yl = _CY * (jnp.maximum(y - 16.0, 0.0))

    r = yl + _CVR * v
    g = yl + _CVG * v + _CUG * u
    bch = yl + _CUB * u
    bgr = jnp.stack([bch, g, r], axis=-1)
    return jnp.clip(jnp.round(bgr), 0.0, 255.0)


def bgr_to_yuv420_host(frames) -> "np.ndarray":
    """Host-side helper: BGR u8 [B,H,W,3] -> flat I420 u8 buffer (for feeding
    the yuv-input device programs from already-decoded BGR, e.g. bench)."""
    import cv2
    import numpy as np

    b, h, w = frames.shape[:3]
    out = np.empty(b * frame_bytes(h, w), np.uint8)
    step = frame_bytes(h, w)
    for i in range(b):
        out[i * step:(i + 1) * step] = cv2.cvtColor(
            frames[i], cv2.COLOR_BGR2YUV_I420).reshape(-1)
    return out
