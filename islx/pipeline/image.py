"""Single-image pose via the production pipelines (batch-of-one).

The parity path (islx.pose.Body/Hand) jit-compiles per image size AND per
hand-crop size — exact but expensive on first use. This helper runs one image
through the bucketed batched pipelines instead: fixed device programs
regardless of crop sizes, ≤1px coordinate differences (PARITY.md).

Two modes:

* default (``fused=False``) — body program, host hand-box detection from the
  grouped skeletons (up to ``max_hands`` crops, multi-person capable), hand
  program on the detected crops;
* ``fused=True`` — ONE device program per frame (body CPM -> on-device
  hand-box placement -> hand CPM, FusedPosePipeline): one upload and one
  fetch per frame, one crop per arm side. The low-latency choice for live
  loops (islx.cli.camera).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from islx.core.config import HandConfig, PoseConfig
from islx.models import cpm
from islx.pipeline.batch_pose import (BatchedBodyPipeline,
                                      BatchedHandPipeline, FusedPosePipeline,
                                      bucket_for)


class ImagePose:
    """frame -> (candidate, subset, all_hand_peaks), production config."""

    def __init__(self, body_params: Optional[cpm.Params] = None,
                 hand_params: Optional[cpm.Params] = None,
                 model_type: str = "body25",
                 max_hands: int = 4,
                 compute_dtype=jnp.bfloat16,
                 fused: bool = False,
                 hand_cfg: Optional[HandConfig] = None):
        self.model_type = model_type
        self.fused = fused
        body_params = (body_params if body_params is not None
                       else cpm.init_params(model_type))
        hand_params = (hand_params if hand_params is not None
                       else cpm.init_params("hand"))
        pose_cfg = PoseConfig(model_type=model_type, max_peaks=16)
        hand_cfg = hand_cfg or HandConfig.production()
        if fused:
            self.pipe = FusedPosePipeline(body_params, hand_params,
                                          model_type, pose_cfg,
                                          hand_cfg,
                                          compute_dtype=compute_dtype)
            self.max_hands = FusedPosePipeline.MAX_HANDS
        else:
            self.max_hands = max_hands
            self.body = BatchedBodyPipeline(body_params, model_type, pose_cfg,
                                            compute_dtype=compute_dtype)
            self.hand = BatchedHandPipeline(hand_params, hand_cfg,
                                            compute_dtype=compute_dtype)

    def __call__(self, img: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
        import cv2

        h0, w0 = img.shape[:2]
        hb, wb = bucket_for(h0, w0, target_h=184)
        bucketed = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
        frames = bucketed[None]
        sy, sx = h0 / hb, w0 / wb
        if self.fused:
            packed = self.pipe.device_step(frames, (h0, w0))
            results, boxes, peaks = self.pipe.assemble(packed, 1)
            (candidate, subset), = results
            hands = self.pipe.hands_for_frame(boxes, peaks, 0, sy, sx)
        else:
            flat = self.body.upload_frames(frames)
            packed = self.body.device_step_flat(flat, 1, hb, wb)
            results = self.body.assemble(packed, 1)
            from islx.pipeline.batch_pose import detect_hand_boxes

            boxes = detect_hand_boxes(results, hb, wb, (h0, w0),
                                      self.max_hands)
            (candidate, subset), = results
            hands = []
            if np.any(boxes[:, 3] > 0):
                peaks = self.hand.from_frames(flat, 1, hb, wb, boxes)
                for slot in range(self.max_hands):
                    if boxes[slot, 3] <= 0:
                        continue
                    pk = peaks[slot].astype(np.float64)
                    pk[:, 0] *= sx
                    pk[:, 1] *= sy
                    hands.append(np.rint(pk).astype(np.int64))
        if candidate.shape[0]:
            candidate[:, 0] *= sx
            candidate[:, 1] *= sy
        return candidate, subset, hands
