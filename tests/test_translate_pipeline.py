"""Batched end-to-end translate pipeline: functional test with stub nets."""
import numpy as np
import pytest

import jax.numpy as jnp

from islx.core.config import HandConfig, PoseConfig, TranslatorConfig
from islx.pipeline.translate import BatchedTranslatePipeline


@pytest.fixture
def stubbed_pipeline(rng, monkeypatch):
    """Pipeline whose CPM forwards return fixed blobby maps guaranteeing one
    person with both arms (so hand boxes fire)."""
    import islx.pipeline.batch_pose as bp

    h8, w8 = 12, 8  # for 96x64 bucket
    heat = np.zeros((h8, w8, 26), np.float32)
    paf = np.zeros((h8, w8, 52), np.float32)
    # joints on a grid; make all 25 joints present at distinct spots
    spots = [(2 + (i % 5) * 2, 1 + (i // 5)) for i in range(25)]
    yy, xx = np.mgrid[0:h8, 0:w8]
    for c, (y, x) in enumerate(spots):
        heat[:, :, c] = 0.9 * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 1.5)
    paf[:] = 0.4  # every limb passes the PAF criteria

    hand_heat = np.zeros((46, 46, 22), np.float32)
    hand_heat[:, :, :21] = 0.7 * np.exp(
        -((np.mgrid[0:46, 0:46][0] - 20) ** 2
          + (np.mgrid[0:46, 0:46][1] - 23) ** 2) / 20.0)[:, :, None]

    def body_fwd(params, x, compute_dtype=None):
        b = x.shape[0]
        return (jnp.broadcast_to(jnp.asarray(paf), (b,) + paf.shape),
                jnp.broadcast_to(jnp.asarray(heat), (b,) + heat.shape))

    def hand_fwd(params, x, compute_dtype=None, stages=6):
        b = x.shape[0]
        hh, wh = x.shape[1] // 8, x.shape[2] // 8
        m = jnp.asarray(hand_heat[:hh, :wh])
        return jnp.broadcast_to(m, (b,) + m.shape)

    monkeypatch.setitem(bp.cpm.FORWARDS, "body25", body_fwd)
    monkeypatch.setattr(bp.cpm, "hand_forward", hand_fwd)

    return BatchedTranslatePipeline(
        body_params={}, hand_params={}, model_type="body25",
        pose_cfg=PoseConfig(model_type="body25", max_peaks=8, thre2=0.01),
        hand_cfg=HandConfig(scale_search=(1.0,)),
        batch=4, compute_dtype=jnp.float32)


def test_translate_stream(stubbed_pipeline, rng):
    frames = [(rng.rand(96, 64, 3) * 255).astype(np.uint8) for _ in range(26)]
    out = stubbed_pipeline.translate_frames(iter(frames))
    # window fills at frame 19 -> predictions for frames 19..25
    assert [o[0] for o in out] == list(range(19, 26))
    for (_idx, cid, expr, prob) in out:
        assert 0 <= cid < 167
        assert isinstance(expr, str)
        assert 0.0 <= prob <= 1.0


def test_image_pose(rng, monkeypatch):
    """ImagePose (production single-image path) returns the pose triple."""
    import islx.pipeline.batch_pose as bp
    from islx.pipeline.image import ImagePose

    h8, w8 = 23, 16
    heat = np.zeros((h8, w8, 26), np.float32)
    paf = np.full((h8, w8, 52), 0.4, np.float32)
    yy, xx = np.mgrid[0:h8, 0:w8]
    for c in range(25):
        y, x = 2 + (c % 5) * 4, 2 + (c // 5) * 3
        heat[:, :, c] = 0.9 * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 1.5)

    def body_fwd(params, x, compute_dtype=None):
        b = x.shape[0]
        return (jnp.broadcast_to(jnp.asarray(paf), (b,) + paf.shape),
                jnp.broadcast_to(jnp.asarray(heat), (b,) + heat.shape))

    def hand_fwd(params, x, compute_dtype=None, stages=6):
        b, hh, wh = x.shape[0], x.shape[1] // 8, x.shape[2] // 8
        m = np.zeros((hh, wh, 22), np.float32)
        m[hh // 2, wh // 2, :21] = 0.9
        return jnp.broadcast_to(jnp.asarray(m), (b,) + m.shape)

    monkeypatch.setitem(bp.cpm.FORWARDS, "body25", body_fwd)
    monkeypatch.setattr(bp.cpm, "hand_forward", hand_fwd)

    img = (rng.rand(368, 256, 3) * 255).astype(np.uint8)
    for fused in (False, True):
        pose = ImagePose(body_params={}, hand_params={},
                         compute_dtype=jnp.float32, fused=fused)
        candidate, subset, hands = pose(img)
        assert candidate.shape[1] == 4
        assert subset.shape[0] >= 1      # dense PAF connects one person
        # coordinates scaled back to original image space
        assert candidate[:, 0].max() <= 256 and candidate[:, 1].max() <= 368


def test_batched_body_coco(rng):
    """The batched pipeline also serves the COCO-18 model family."""
    import islx.pipeline.batch_pose as bp
    from islx.core.config import PoseConfig
    from islx.pipeline.batch_pose import BatchedBodyPipeline

    h8, w8 = 12, 8
    heat = np.zeros((h8, w8, 19), np.float32)
    paf = np.full((h8, w8, 38), 0.3, np.float32)
    yy, xx = np.mgrid[0:h8, 0:w8]
    for c in range(18):
        y, x = 1 + (c % 4) * 3, 1 + (c // 4) * 2
        heat[:, :, c] = 0.8 * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 1.2)

    def coco_fwd(params, x, compute_dtype=None):
        b = x.shape[0]
        return (jnp.broadcast_to(jnp.asarray(paf), (b,) + paf.shape),
                jnp.broadcast_to(jnp.asarray(heat), (b,) + heat.shape))

    orig = bp.cpm.FORWARDS["coco"]
    bp.cpm.FORWARDS["coco"] = coco_fwd
    try:
        pipe = BatchedBodyPipeline({}, "coco",
                                   PoseConfig(model_type="coco", max_peaks=8),
                                   compute_dtype=jnp.float32)
        out = pipe(np.zeros((2, 96, 64, 3), np.uint8))
    finally:
        bp.cpm.FORWARDS["coco"] = orig
    for cand, subset in out:
        assert cand.shape[1] == 4
        assert subset.shape[1] == 20     # njoint 19 + 1


def test_features_nonzero(stubbed_pipeline, rng):
    frames = np.stack([(rng.rand(96, 64, 3) * 255).astype(np.uint8)
                       for _ in range(4)])
    feats = stubbed_pipeline.process_batch(frames, (96, 64))
    assert len(feats) == 4
    for f in feats:
        assert f.shape == (156,)
        assert np.any(f[:30] != 0)    # body features present


def test_translate_yuv_stream(stubbed_pipeline, rng):
    """The I420 streaming path (device-side conversion) produces the same
    prediction cadence as the BGR path; features agree because the stub
    nets ignore pixel values."""
    from islx.ops import yuv

    frames = np.stack([(rng.rand(96, 64, 3) * 255).astype(np.uint8)
                       for _ in range(26)])
    flat = yuv.bgr_to_yuv420_host(frames)
    per = yuv.frame_bytes(96, 64)
    flats = [flat[i * per:(i + 1) * per] for i in range(26)]
    out = stubbed_pipeline.translate_yuv_frames(flats, (96, 64), (96, 64))
    assert [o[0] for o in out] == list(range(19, 26))

    bgr_out = stubbed_pipeline.translate_frames(iter(frames))
    assert [o[:2] for o in out] == [o[:2] for o in bgr_out]


def test_thre1_override(stubbed_pipeline, rng):
    """tp.thre1 reaches the fused program as the traced peak threshold:
    above the stub heatmaps' 0.9 amplitude no peaks (hence no people)
    survive; resetting to None restores the config threshold."""
    frames = np.stack([(rng.rand(96, 64, 3) * 255).astype(np.uint8)
                       for _ in range(4)])
    feats = stubbed_pipeline.process_batch(frames, (96, 64))
    assert any(np.any(f != 0) for f in feats)

    stubbed_pipeline.thre1 = 2.0          # > stub peak amplitude
    feats_hi = stubbed_pipeline.process_batch(frames, (96, 64))
    assert all(np.all(f == 0) for f in feats_hi)

    stubbed_pipeline.thre1 = None
    feats_back = stubbed_pipeline.process_batch(frames, (96, 64))
    np.testing.assert_array_equal(np.stack(feats_back), np.stack(feats))
