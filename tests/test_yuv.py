"""On-device YUV420->BGR conversion vs cv2, and the fused yuv-input program."""
import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")


def _rand_bgr(rng, b, h, w):
    return (rng.rand(b, h, w, 3) * 255).astype(np.uint8)


def test_yuv420_to_bgr_matches_cv2():
    from islx.ops import yuv

    rng = np.random.RandomState(0)
    b, h, w = 3, 48, 64
    bgr = _rand_bgr(rng, b, h, w)
    flat = yuv.bgr_to_yuv420_host(bgr)
    got = np.asarray(yuv.yuv420_to_bgr(jnp.asarray(flat), b, h, w))
    want = np.stack([
        cv2.cvtColor(flat.reshape(b, -1)[i].reshape(h * 3 // 2, w),
                     cv2.COLOR_YUV2BGR_I420) for i in range(b)])
    diff = np.abs(got - want.astype(np.float32))
    assert diff.max() <= 1.0, diff.max()  # fixed-point vs float rounding
    assert (diff > 0).mean() < 0.05       # and almost everywhere exact


def test_yuv420_extremes():
    """Saturating cast: pure black/white/chroma-extreme inputs stay in
    [0,255] like cv2's saturate_cast."""
    from islx.ops import yuv

    h = w = 16
    n, q = h * w, h * w // 4
    for yv, uv, vv in ((0, 0, 0), (255, 255, 255), (16, 128, 128),
                       (235, 0, 255)):
        flat = np.concatenate([
            np.full(n, yv, np.uint8), np.full(q, uv, np.uint8),
            np.full(q, vv, np.uint8)])
        got = np.asarray(yuv.yuv420_to_bgr(jnp.asarray(flat), 1, h, w))
        want = cv2.cvtColor(flat.reshape(h * 3 // 2, w),
                            cv2.COLOR_YUV2BGR_I420).astype(np.float32)
        assert got.min() >= 0 and got.max() <= 255
        assert np.abs(got[0] - want).max() <= 1.0


def test_fused_pipeline_yuv_input():
    """The fused program with input_format='yuv420' matches the bgr program
    fed the cv2-decoded BGR of the SAME I420 bytes (identical pixels modulo
    <=1 LSB conversion rounding -> identical packed tables on these
    smooth-free random scenes is too strict; assert structure + box/peak
    agreement through the shared decode)."""
    from islx.core.config import HandConfig, PoseConfig
    from islx.models import cpm
    from islx.ops import yuv
    from islx.pipeline.batch_pose import FusedPosePipeline

    rng = np.random.RandomState(3)
    b, hb, wb = 2, 48, 48
    bgr = _rand_bgr(rng, b, hb, wb)
    flat_yuv = yuv.bgr_to_yuv420_host(bgr)
    # exact round trip: decode the SAME i420 bytes with cv2 and feed the
    # bgr program that — any output difference is then purely the device
    # converter vs cv2 (<=1 LSB), not chroma subsampling loss
    decoded = np.stack([
        cv2.cvtColor(flat_yuv.reshape(b, -1)[i].reshape(hb * 3 // 2, wb),
                     cv2.COLOR_YUV2BGR_I420) for i in range(b)])

    pipe = FusedPosePipeline(
        cpm.init_params("body25"), cpm.init_params("hand"),
        pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
        hand_cfg=HandConfig(scale_search=(0.25,)),
        compute_dtype=jnp.float32)
    packed_yuv = np.asarray(pipe.device_step_flat(
        jnp.asarray(flat_yuv), b, hb, wb, (hb, wb), 0.05,
        input_format="yuv420"))
    packed_bgr = np.asarray(pipe.device_step_flat(
        pipe.upload_frames(decoded), b, hb, wb, (hb, wb), 0.05))
    assert packed_yuv.shape == packed_bgr.shape
    # peak COUNTS per joint are robust to <=1 LSB pixel differences
    _, _, count_y, _, _, _ = pipe.body.unpack(
        pipe.unpack(packed_yuv, b)[0], b)
    _, _, count_b, _, _, _ = pipe.body.unpack(
        pipe.unpack(packed_bgr, b)[0], b)
    assert np.abs(count_y.astype(int) - count_b.astype(int)).mean() < 1.0
