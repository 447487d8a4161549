"""Single-image pose via the production pipelines (batch-of-one).

The parity path (islx.pose.Body/Hand) jit-compiles per image size AND per
hand-crop size — exact but expensive on first use. This helper runs one image
through the bucketed batched pipelines instead: two fixed device programs
regardless of crop sizes, ≤1px coordinate differences (PARITY.md).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from islx.core.config import HandConfig, PoseConfig
from islx.models import cpm
from islx.pipeline.batch_pose import (BatchedBodyPipeline,
                                      BatchedHandPipeline, bucket_for)


class ImagePose:
    """frame -> (candidate, subset, all_hand_peaks), production config."""

    def __init__(self, body_params: Optional[cpm.Params] = None,
                 hand_params: Optional[cpm.Params] = None,
                 model_type: str = "body25",
                 max_hands: int = 4,
                 compute_dtype=jnp.bfloat16):
        self.model_type = model_type
        self.max_hands = max_hands
        self.body = BatchedBodyPipeline(
            body_params if body_params is not None
            else cpm.init_params(model_type),
            model_type, PoseConfig(model_type=model_type, max_peaks=16),
            compute_dtype=compute_dtype)
        self.hand = BatchedHandPipeline(
            hand_params if hand_params is not None
            else cpm.init_params("hand"),
            HandConfig(scale_search=(1.0,)), compute_dtype=compute_dtype)

    def __call__(self, img: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
        import cv2

        h0, w0 = img.shape[:2]
        hb, wb = bucket_for(h0, w0, target_h=184)
        bucketed = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
        frames = bucketed[None]
        flat = self.body.upload_frames(frames)
        packed = self.body.device_step_flat(flat, 1, hb, wb)
        results = self.body.assemble(packed, 1)
        sy, sx = h0 / hb, w0 / wb
        from islx.pipeline.batch_pose import detect_hand_boxes

        boxes = detect_hand_boxes(results, hb, wb, (h0, w0), self.max_hands)
        (candidate, subset), = results
        if candidate.shape[0]:
            candidate[:, 0] *= sx
            candidate[:, 1] *= sy
        hands: List[np.ndarray] = []
        if np.any(boxes[:, 3] > 0):
            peaks = self.hand.from_frames(flat, 1, hb, wb, boxes)
            for slot in range(self.max_hands):
                if boxes[slot, 3] <= 0:
                    continue
                pk = peaks[slot].astype(np.float64)
                pk[:, 0] = np.where(pk[:, 0] == 0, 0, pk[:, 0] * sx)
                pk[:, 1] = np.where(pk[:, 1] == 0, 0, pk[:, 1] * sy)
                hands.append(np.rint(pk).astype(np.int64))
        return candidate, subset, hands
