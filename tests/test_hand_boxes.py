"""Device hand-box placement (islx.ops.hand_boxes) vs the host path
(islx.pose.detector.hand_detect + batch_pose.detect_hand_boxes), and the
single-program FusedPosePipeline plumbing."""
import jax.numpy as jnp
import numpy as np
import pytest

from islx.ops.hand_boxes import device_hand_boxes
from islx.ops.paf import LIMB_SEQ_BODY25

C, K, L, M = 24, 16, 24, 48
HB, WB = 184, 248
SY = SX = 2.0  # orig = (368, 496)


def _scene(joints):
    """joints: {channel: (x, y)} single-peak-per-channel scene in BUCKET
    coords -> (pk_xy, cc_pair, cc_score, cc_ok, candidate, subset)."""
    pk_xy = np.zeros((C, K, 2), np.int32)
    for ch, (x, y) in joints.items():
        pk_xy[ch, 0] = (x, y)
    pair = np.zeros((L, M), np.int32)
    score = np.zeros((L, M), np.float32)
    ok = np.zeros((L, M), bool)
    rows = {tuple(p): i for i, p in enumerate(LIMB_SEQ_BODY25.tolist())}
    for a, b in ((2, 3), (3, 4), (5, 6), (6, 7)):
        if a in joints and b in joints:
            r = rows[(a, b)]
            score[r, 0] = 0.9
            ok[r, 0] = True
    candidate = np.array([[x, y, 1.0, i]
                          for i, (ch, (x, y)) in
                          enumerate(sorted(joints.items()))], np.float64)
    subset = -np.ones((1, 27), np.float64)
    for i, ch in enumerate(sorted(joints)):
        subset[0, ch] = i
    return pk_xy, pair, score, ok, candidate, subset


def _device_boxes(pk_xy, pair, score, ok):
    out = device_hand_boxes(jnp.asarray(pk_xy), jnp.asarray(pair),
                            jnp.asarray(score), jnp.asarray(ok),
                            LIMB_SEQ_BODY25, SY, SX, HB, WB)
    return np.asarray(out)  # [2,3] rows: left, right


def _host_boxes(candidate, subset):
    from islx.pipeline.batch_pose import detect_hand_boxes

    return detect_hand_boxes([(candidate, subset)], HB, WB,
                             (int(HB * SY), int(WB * SX)), 2)


class TestDeviceHandBoxes:
    def test_both_arms_match_host(self):
        joints = {2: (60, 40), 3: (70, 80), 4: (75, 120),
                  5: (140, 40), 6: (150, 80), 7: (160, 120)}
        dev = _device_boxes(*_scene(joints)[:4])
        host = _host_boxes(*_scene(joints)[4:])
        # host fills slots in detection order: left (5,6,7) first, then right
        np.testing.assert_array_equal(dev[0], host[0, 1:])
        np.testing.assert_array_equal(dev[1], host[1, 1:])

    def test_short_arm_dropped(self):
        # all arm segments a few px -> width = 1.5*max(|we|, 0.9*|es|) < 20
        joints = {2: (70, 40), 3: (70, 44), 4: (72, 46)}
        dev = _device_boxes(*_scene(joints)[:4])
        host = _host_boxes(*_scene(joints)[4:])
        assert dev[0, 2] == 0 and dev[1, 2] == 0
        assert (host[:, 3] == 0).all()

    def test_missing_shoulder_connection(self):
        # elbow->wrist exists but no shoulder->elbow: reference requires the
        # full arm triple (src/util.py:253-261)
        joints = {3: (70, 80), 4: (75, 120)}
        dev = _device_boxes(*_scene(joints)[:4])
        assert dev[1, 2] == 0

    def test_multi_candidate_picks_best_score(self):
        pk_xy, pair, score, ok, candidate, subset = _scene(
            {2: (60, 40), 3: (70, 80), 4: (75, 120)})
        # add a second, better-scoring right arm using peak index 1
        pk_xy[2, 1] = (160, 40)
        pk_xy[3, 1] = (170, 80)
        pk_xy[4, 1] = (175, 130)
        rows = {tuple(p): i for i, p in enumerate(LIMB_SEQ_BODY25.tolist())}
        for a, b in ((2, 3), (3, 4)):
            r = rows[(a, b)]
            pair[r, 1] = 1 * K + 1
            score[r, 1] = 1.5
            ok[r, 1] = True
        dev = device_hand_boxes(jnp.asarray(pk_xy), jnp.asarray(pair),
                                jnp.asarray(score), jnp.asarray(ok),
                                LIMB_SEQ_BODY25, SY, SX, HB, WB)
        host = _host_boxes(
            np.array([[160, 40, 1, 0], [170, 80, 1, 1], [175, 130, 1, 2]],
                     np.float64),
            np.array([[-1, -1, 0, 1, 2] + [-1] * 22], np.float64))
        np.testing.assert_array_equal(np.asarray(dev)[1], host[0, 1:])


class TestCrowdedScenes:
    """PARITY.md divergence #6 quantified: randomized two-person scenes with
    ground-truth-style PAF fields, ONE shared connection table consumed by
    both the host grouping path and the device chaining path, so any
    disagreement is purely grouping-vs-chaining (tools/handbox_crowd_eval.py;
    reference geometry src/util.py:242-306 after src/body.py:185-231)."""

    def test_isolated_people_always_match(self):
        import sys
        sys.path.insert(0, ".")
        from tools.handbox_crowd_eval import evaluate

        (row,) = evaluate(separations=(80.0,), scenes=25, seed=0)
        assert row["match_rate"] == 1.0
        assert row["chimera"] == row["miss"] == row["extra"] == 0

    def test_heavy_overlap_divergence_bounded(self):
        import sys
        sys.path.insert(0, ".")
        from tools.handbox_crowd_eval import evaluate

        (row,) = evaluate(separations=(12.0,), scenes=25, seed=0)
        # measured round 4: 2-4% chimera at 12px torso separation (150-scene
        # run recorded in PARITY.md #6); regression bound with slack
        assert row["chimera_rate"] <= 0.15
        assert row["match_rate"] >= 0.80
        assert row["miss"] == 0  # the device chain never loses a real arm


class TestFusedPosePipeline:
    @pytest.fixture(scope="class")
    def fused(self):
        from islx.models import cpm
        from islx.pipeline.batch_pose import FusedPosePipeline

        return FusedPosePipeline(cpm.init_params("body25"),
                                 cpm.init_params("hand"))

    def test_matches_split_pipelines(self, fused):
        rng = np.random.RandomState(0)
        b, hb, wb = 2, 96, 96
        frames = (rng.rand(b, hb, wb, 3) * 255).astype(np.uint8)
        packed = fused.device_step(frames, thre1=0.05)
        results, boxes, peaks = fused.assemble(packed, b)
        assert boxes.shape == (b * 2, 4) and peaks.shape == (b * 2, 21, 2)

        # body tables inside the fused program == the standalone body program
        body_packed = np.asarray(fused.body.device_step(frames, 0.05))
        body_view, _, _ = fused.unpack(packed, b)
        np.testing.assert_allclose(body_view, body_packed, atol=1e-5)

        # hand peaks == the standalone fused-hand program fed the SAME boxes
        flat = fused.upload_frames(frames)
        peaks2 = fused.hand.from_frames(flat, b, hb, wb, boxes)
        np.testing.assert_array_equal(peaks, peaks2)

    def test_valid_box_produces_peaks(self, fused):
        # frames crafted so the body net sees SOMETHING; with random weights
        # boxes may or may not appear — assert the invalid-slot contract
        rng = np.random.RandomState(1)
        frames = (rng.rand(2, 96, 96, 3) * 255).astype(np.uint8)
        packed = fused.device_step(frames, thre1=0.01)
        _, boxes, peaks = fused.unpack(packed, 2)
        for i in range(boxes.shape[0]):
            if boxes[i, 3] == 0:
                assert (peaks[i] == 0).all()

    def test_multiscale_body_in_fused(self):
        """The fused program composes with the batched multi-scale body
        pyramid (BASELINE config 2 + hands in one device program)."""
        from islx.core.config import HandConfig, PoseConfig
        from islx.models import cpm
        from islx.pipeline.batch_pose import FusedPosePipeline

        import jax.numpy as jnp

        rng = np.random.RandomState(2)
        b, hb, wb = 2, 96, 96
        frames = (rng.rand(b, hb, wb, 3) * 255).astype(np.uint8)
        cfg = PoseConfig(model_type="body25", max_peaks=8,
                         scale_search=(0.5, 1.0), boxsize=96)
        fused = FusedPosePipeline(cpm.init_params("body25"),
                                  cpm.init_params("hand"),
                                  pose_cfg=cfg,
                                  hand_cfg=HandConfig(scale_search=(0.25,)),
                                  compute_dtype=jnp.float32)
        packed = fused.device_step(frames, thre1=0.05)
        body_view, boxes, peaks = fused.unpack(packed, b)
        body_packed = np.asarray(fused.body.device_step(frames, 0.05))
        np.testing.assert_allclose(body_view, body_packed, atol=1e-4)
        assert boxes.shape == (b * 2, 4)

    def test_fused_coco_model(self):
        """The fused program serves the COCO-18 family too (arm chains use
        the same joint channels 2-7; limb rows resolved per table)."""
        from islx.core.config import HandConfig, PoseConfig
        from islx.models import cpm
        from islx.ops.hand_boxes import arm_limb_rows
        from islx.ops.paf import LIMB_SEQ_COCO
        from islx.pipeline.batch_pose import FusedPosePipeline

        import jax.numpy as jnp

        (se_l, ew_l), (se_r, ew_r) = arm_limb_rows(LIMB_SEQ_COCO)
        assert tuple(LIMB_SEQ_COCO[ew_r]) == (3, 4)
        assert tuple(LIMB_SEQ_COCO[se_l]) == (5, 6)

        rng = np.random.RandomState(5)
        frames = (rng.rand(1, 48, 48, 3) * 255).astype(np.uint8)
        fused = FusedPosePipeline(
            cpm.init_params("coco"), cpm.init_params("hand"),
            model_type="coco",
            pose_cfg=PoseConfig(model_type="coco", max_peaks=8),
            hand_cfg=HandConfig(scale_search=(0.25,)),
            compute_dtype=jnp.float32)
        results, boxes, peaks = fused.assemble(fused.device_step(frames), 1)
        assert len(results) == 1 and boxes.shape == (2, 4)
