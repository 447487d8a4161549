"""End-to-end ISL translation: frames -> pose -> features -> BiLSTM -> sign.

Replaces the reference composites ``ISLSignPos`` / ``ISLSignPosTranslator``
(src/ISL_Model_parameter.py:41-60,308-353) with one pipeline class, with one
decisive behavioural fix: the reference re-runs the FULL pose stack on all 20
window frames for every emitted prediction (src/ISL_Model_parameter.py:322-343
— 20x recompute per frame as the window slides by 1). Here per-frame features
are computed once and cached in a rolling buffer, so each new frame costs one
pose pass + one (cheap) BiLSTM pass; outputs are identical.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from islx.core.config import TranslatorConfig
from islx.isl import features as F
from islx.isl.expressions import EXPRESSIONS
from islx.models import translator as T
from islx.pose.body import Body
from islx.pose.detector import hand_detect
from islx.pose.hand import Hand


class ISLSignPos:
    """Body + hand composite (reference src/ISL_Model_parameter.py:51-60):
    frame -> (candidate, subset, all_hand_peaks)."""

    def __init__(self, body: Body, hand: Hand):
        self.body = body
        self.hand = hand

    def __call__(self, frame: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
        candidate, subset = self.body(frame)
        hands_list = hand_detect(candidate, subset, frame.shape)
        all_hand_peaks = []
        for x, y, w, _is_left in hands_list:
            peaks = self.hand(frame[y:y + w, x:x + w, :]).astype(np.int64)
            # re-offset crop coords into full-image space, keeping the (0,0)
            # missing sentinel (reference demo.py:36-37)
            peaks[:, 0] = np.where(peaks[:, 0] == 0, peaks[:, 0], peaks[:, 0] + x)
            peaks[:, 1] = np.where(peaks[:, 1] == 0, peaks[:, 1], peaks[:, 1] + y)
            all_hand_peaks.append(peaks)
        return candidate, subset, all_hand_peaks


class ISLTranslator:
    """Rolling-window sign translator with per-frame feature cache."""

    def __init__(self, body: Body, hand: Hand,
                 head_params: Optional[T.Params] = None,
                 cfg: TranslatorConfig = TranslatorConfig()):
        self.pose = ISLSignPos(body, hand)
        self.cfg = cfg
        self.model_type = body.model_type
        self.head_params = (head_params if head_params is not None
                            else T.init_params(cfg))
        self._window: List[np.ndarray] = []
        self._head = jax.jit(lambda p, x: T.forward(p, x))

    # ----- streaming API (fixes the reference's 20x recompute) -----

    def frame_features(self, frame: np.ndarray) -> np.ndarray:
        candidate, subset, all_hand_peaks = self.pose(frame)
        return F.frame_features(candidate, subset, all_hand_peaks,
                                self.model_type)

    def push(self, frame: np.ndarray) -> Optional[np.ndarray]:
        """Add one frame; returns [167] probabilities once the window is full
        (the reference also only predicts on full windows,
        demo_isl_translate.py:183-193)."""
        feat = self.frame_features(frame)
        self._window.append(feat)
        if len(self._window) > self.cfg.window_size:
            self._window.pop(0)
        if len(self._window) < self.cfg.window_size:
            return None
        return self.predict_from_features(np.stack(self._window))

    def reset(self) -> None:
        self._window.clear()

    # ----- window API (reference-compatible ISLSignPosTranslator.call) -----

    def predict_from_features(self, feats: np.ndarray) -> np.ndarray:
        """feats [T<=20,156] -> probabilities [167]; zero-pads short windows
        (reference src/ISL_Model_parameter.py:344-346)."""
        t = feats.shape[0]
        if t < self.cfg.window_size:
            pad = np.zeros((self.cfg.window_size - t, self.cfg.feature_dim))
            feats = np.concatenate([feats, pad], axis=0)
        x = jnp.asarray(feats[None], jnp.float32)
        return np.asarray(self._head(self.head_params, x))[0]

    def __call__(self, window: np.ndarray) -> np.ndarray:
        """window [T,H,W,3] u8 -> probabilities [1,167] (reference contract,
        src/ISL_Model_parameter.py:322-353)."""
        feats = np.stack([self.frame_features(f) for f in window])
        return self.predict_from_features(feats)[None]

    # ----- convenience -----

    def top_expression(self, probs: np.ndarray) -> Tuple[int, str, float]:
        idx = int(np.argmax(probs))
        return idx, EXPRESSIONS[idx], float(probs[idx])

    def translate_video_frames(self, frames: Sequence[np.ndarray]
                               ) -> List[Tuple[int, int, str, float]]:
        """-> [(frame_idx, class_id, expression, prob)] for each full window
        (mirrors the demo loop demo_isl_translate.py:171-197)."""
        self.reset()
        out = []
        for idx, frame in enumerate(frames):
            probs = self.push(frame)
            if probs is not None:
                cid, expr, p = self.top_expression(probs)
                out.append((idx, cid, expr, p))
        return out
