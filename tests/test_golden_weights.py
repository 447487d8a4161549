"""Real-checkpoint golden parity on the reference's own demo image.

The reference ships no weights in-repo (model/ is download-only,
README.md:43-54), so this test is GATED on ISLX_WEIGHTS_DIR pointing at a
directory containing any of:

    pose_iter_584000.caffemodel.pt | body25.npz   (BODY_25)
    body_pose_model.pth            | coco.npz     (COCO)
    hand_pose_model.pth            | hand.npz     (hand CPM)

It lights up the moment weights are downloaded: islx Body() vs the
reference's own src/body.py running the SAME converted checkpoint through
torch, mean keypoint L2 < 1px on images/demo.jpg (BASELINE.md north star).
"""
import os

import numpy as np
import pytest

from tests.conftest import has_reference, has_torch

WEIGHTS_DIR = os.environ.get("ISLX_WEIGHTS_DIR", "")
DEMO = "/root/reference/images/demo.jpg"


def _find(names):
    for n in names:
        p = os.path.join(WEIGHTS_DIR, n)
        if WEIGHTS_DIR and os.path.exists(p):
            return p
    return None


BODY25 = _find(["pose_iter_584000.caffemodel.pt", "body25.npz",
                "pose_iter_584000.caffemodel"])
HAND = _find(["hand_pose_model.pth", "hand.npz"])


def _torch_loadable(path):
    """The reference oracle loads checkpoints via torch.load
    (/root/reference/src/body.py:35), so only .pt/.pth/.caffemodel can feed
    the reference-comparison tests; .npz checkpoints are islx-only and the
    comparison tests skip on them."""
    return path is not None and path.endswith((".pt", ".pth", ".caffemodel"))


requires_weights = pytest.mark.skipif(
    not (WEIGHTS_DIR and has_reference() and has_torch()),
    reason="set ISLX_WEIGHTS_DIR to a directory with downloaded reference "
           "checkpoints (and need /root/reference + torch)")

requires_ref_loadable = pytest.mark.skipif(
    not (_torch_loadable(BODY25) and (HAND is None or _torch_loadable(HAND))),
    reason="reference torch oracle needs .pt/.pth checkpoints "
           "(npz is islx-only)")


def _reference_body(model_path, model_type, ori_img):
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.ref_oracle import _install_stubs

    _install_stubs()
    from src.body import Body

    return Body(model_path, model_type)(ori_img)


def _mean_keypoint_l2(cand_a, cand_b):
    """Match candidates greedily by joint order; both lists come from the
    same detections so lengths should agree."""
    n = min(len(cand_a), len(cand_b))
    assert n > 0, "no keypoints detected"
    a = np.asarray(cand_a)[:n, :2]
    b = np.asarray(cand_b)[:n, :2]
    return float(np.sqrt(((a - b) ** 2).sum(-1)).mean())


@requires_weights
@requires_ref_loadable
@pytest.mark.skipif(BODY25 is None, reason="body25 checkpoint not found")
def test_body25_demo_golden():
    import cv2

    from islx.pose.body import Body

    ori = cv2.imread(DEMO)
    assert ori is not None
    cand_ref, subset_ref = _reference_body(BODY25, "body25", ori)
    cand, subset = Body(BODY25, "body25")(ori)
    assert len(cand) == len(cand_ref), (len(cand), len(cand_ref))
    assert subset.shape == np.asarray(subset_ref).shape
    assert _mean_keypoint_l2(cand, cand_ref) < 1.0


@requires_weights
@requires_ref_loadable
@pytest.mark.skipif(BODY25 is None or HAND is None,
                    reason="body25+hand checkpoints not found")
def test_full_demo_pipeline_golden():
    """demo.py-equivalent end-to-end (body + handDetect + hand) runs and all
    hand peaks land within 1px of the reference's."""
    import sys

    import cv2

    from islx.pose.body import Body
    from islx.pose.detector import hand_detect
    from islx.pose.hand import Hand

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.ref_oracle import _install_stubs

    _install_stubs()
    from src.hand import Hand as RefHand

    ori = cv2.imread(DEMO)
    cand, subset = Body(BODY25, "body25")(ori)
    hand = Hand(HAND)
    ref_hand = RefHand(HAND)
    boxes = hand_detect(cand, subset, ori.shape)
    assert len(boxes) > 0
    for x, y, w, _ in boxes:
        crop = ori[y:y + w, x:x + w, :]
        peaks = np.asarray(hand(crop), np.float64)
        ref_peaks = np.asarray(ref_hand(crop), np.float64)
        d = np.sqrt(((peaks - ref_peaks) ** 2).sum(-1))
        assert float(d.mean()) < 1.0


@requires_weights
@pytest.mark.skipif(BODY25 is None, reason="body25 checkpoint not found")
def test_int8_quantized_accuracy_golden():
    """Int8 (W8A8) trunk accuracy on real weights: quantized body25
    keypoints within 2px mean L2 of the float pipeline on demo.jpg. This is
    the gate for making the int8 path (islx/models/quant.py, +27% e2e
    measured) the production default."""
    import cv2
    import jax.numpy as jnp

    from islx.core import weights as W
    from islx.models import quant
    from islx.pipeline.batch_pose import BatchedBodyPipeline, bucket_for

    ori = cv2.imread(DEMO)
    h0, w0 = ori.shape[:2]
    hb, wb = bucket_for(h0, w0)
    frame = cv2.resize(ori, (wb, hb), interpolation=cv2.INTER_CUBIC)
    params = W.load(BODY25, "body25")
    xcal = frame[None].astype(np.float32) / 256.0 - 0.5
    qparams = quant.quantize_model(params, "body25", [xcal])

    f_pipe = BatchedBodyPipeline(params, "body25",
                                 compute_dtype=jnp.bfloat16)
    q_pipe = BatchedBodyPipeline(qparams, "body25",
                                 compute_dtype=jnp.bfloat16)
    (cand_f, _), = f_pipe.assemble(f_pipe.device_step(frame[None]), 1)
    (cand_q, _), = q_pipe.assemble(q_pipe.device_step(frame[None]), 1)
    assert len(cand_f) > 0
    assert _mean_keypoint_l2(cand_q, cand_f) < 2.0
