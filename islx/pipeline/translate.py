"""Batched end-to-end ISL translation — the production config-5 pipeline.

Video frames -> ONE fused device program per batch (body CPM -> peaks/PAF
tables -> on-device hand-box placement -> hand CPM; FusedPosePipeline) ->
host grouping from the same fetch -> 156-dim features -> rolling 20-frame
windows -> batched BiLSTM head.

Per batch of B frames this costs ONE frame upload and ONE packed fetch —
compare the reference's per-prediction cost of 20 full pose stacks with
per-scale device round trips (src/ISL_Model_parameter.py:322-353, SURVEY.md
§3.3), and the previous split flow's fetch -> host grouping -> box upload ->
second fetch chain (each transfer pays a fixed RPC cost on tunneled TPU
runtimes).
"""
from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from islx.core.config import HandConfig, PoseConfig, TranslatorConfig
from islx.isl import features as F
from islx.isl.expressions import EXPRESSIONS
from islx.models import cpm
from islx.models import translator as T
from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for


class BatchedTranslatePipeline:
    """Streaming frames -> per-frame sign predictions, batch-at-a-time."""

    def __init__(self,
                 body_params: Optional[cpm.Params] = None,
                 hand_params: Optional[cpm.Params] = None,
                 head_params: Optional[T.Params] = None,
                 model_type: str = "body25",
                 pose_cfg: Optional[PoseConfig] = None,
                 hand_cfg: Optional[HandConfig] = None,
                 cfg: TranslatorConfig = TranslatorConfig(),
                 batch: int = 16,
                 compute_dtype=jnp.bfloat16,
                 mesh=None):
        self.cfg = cfg
        self.batch = batch
        self.model_type = model_type
        if mesh is not None and batch % mesh.shape["data"]:
            raise ValueError(
                f"batch {batch} not divisible by mesh data axis "
                f"{mesh.shape['data']}")
        self.pipe = FusedPosePipeline(
            body_params if body_params is not None
            else cpm.init_params(model_type),
            hand_params if hand_params is not None
            else cpm.init_params("hand"),
            model_type,
            pose_cfg or PoseConfig(model_type=model_type, max_peaks=16),
            hand_cfg or HandConfig.production(),
            compute_dtype=compute_dtype,
            mesh=mesh)
        # one hand crop per arm side — the ISL 156-dim feature contract
        # (body 78 + left hand 39 + right hand 39, islx.isl.features)
        self.max_hands = FusedPosePipeline.MAX_HANDS
        # runtime peak-threshold override (traced scalar — changing it never
        # recompiles); None = pose_cfg.thre1. Lets callers calibrate on live
        # output density (tools/translate_bench.py does, for random weights)
        self.thre1: Optional[float] = None
        self.head_params = (head_params if head_params is not None
                            else T.init_params(cfg))
        self._head = jax.jit(lambda p, x: T.forward(p, x))
        self._window: List[np.ndarray] = []
        # optional host-side stage accounting (tools/translate_bench.py
        # --prof): dict of stage -> accumulated seconds. The split answers
        # "where does the config-5 gap go" (VERDICT r4 #4): upload/dispatch
        # vs blocking fetch+grouping vs featurization vs head.
        self.prof: Optional[dict] = None

    def _tick(self, key: str, t0: float) -> None:
        if self.prof is not None:
            import time

            self.prof[key] = (self.prof.get(key, 0.0)
                              + (time.perf_counter() - t0))

    def reset(self) -> None:
        self._window.clear()

    # ------------------------------------------------------------------

    def dispatch_batch(self, frames_bucketed: np.ndarray,
                       orig_hw: Tuple[int, int]):
        """Async: upload + dispatch the fused program, return handles."""
        import time

        t0 = time.perf_counter()
        b, hb, wb = frames_bucketed.shape[:3]
        flat = self.pipe.upload_frames(frames_bucketed)
        packed = self.pipe.device_step_flat(flat, b, hb, wb, orig_hw,
                                            self.thre1)
        self._tick("dispatch", t0)
        return packed, (b, hb, wb)

    def finish_batch(self, handles, orig_hw: Tuple[int, int]
                     ) -> List[np.ndarray]:
        """Consume a dispatched batch: one fetch -> grouping + features."""
        import time

        packed, (b, hb, wb) = handles
        h0, w0 = orig_hw
        sy, sx = h0 / hb, w0 / wb
        t0 = time.perf_counter()
        results, boxes, peaks = self.pipe.assemble(packed, b)
        self._tick("fetch_group", t0)
        return self._features(results, boxes, peaks, sy, sx)

    def process_batch(self, frames_bucketed: np.ndarray,
                      orig_hw: Tuple[int, int]
                      ) -> List[np.ndarray]:
        """u8 [B,Hb,Wb,3] -> per-frame 156-dim feature vectors (orig coords)."""
        return self.finish_batch(self.dispatch_batch(frames_bucketed,
                                                     orig_hw), orig_hw)

    def _features(self, results, boxes, peaks, sy, sx) -> List[np.ndarray]:
        import time

        t0 = time.perf_counter()
        feats = []
        for fidx, (cand, subset) in enumerate(results):
            if cand.shape[0]:
                cand = cand.copy()
                cand[:, 0] *= sx
                cand[:, 1] *= sy
            hands = self.pipe.hands_for_frame(boxes, peaks, fidx, sy, sx)
            feats.append(F.frame_features(cand, subset, hands,
                                          self.model_type))
        self._tick("featurize", t0)
        return feats

    # ------------------------------------------------------------------

    def _make_emitter(self, out: List[Tuple[int, int, str, float]]):
        """Rolling-window feature consumer: feats -> head -> predictions
        appended to ``out``. Shared by the BGR and YUV streaming paths."""
        state = {"idx0": 0}

        def emit(feats):
            windows = []
            widx = []
            for i, f in enumerate(feats):
                self._window.append(f)
                if len(self._window) > self.cfg.window_size:
                    self._window.pop(0)
                if len(self._window) == self.cfg.window_size:
                    windows.append(np.stack(self._window))
                    widx.append(state["idx0"] + i)
            if windows:
                import time

                t0 = time.perf_counter()
                x = jnp.asarray(np.stack(windows), jnp.float32)
                probs = np.asarray(self._head(self.head_params, x))
                self._tick("head", t0)
                for w, pr in zip(widx, probs):
                    cid = int(np.argmax(pr))
                    out.append((w, cid, EXPRESSIONS[cid], float(pr[cid])))
            state["idx0"] += len(feats)

        return emit

    def translate_frames(self, frames: Iterable[np.ndarray],
                         orig_hw: Optional[Tuple[int, int]] = None
                         ) -> List[Tuple[int, int, str, float]]:
        """Stream frames -> [(frame_idx, class_id, expression, prob)]."""

        from islx.pipeline.video import FrameBatcher

        self.reset()
        out: List[Tuple[int, int, str, float]] = []
        hw = None
        pending = None  # (handles, n_valid) — batch dispatched, not consumed
        emit = self._make_emitter(out)

        def flush(batch, n_valid):
            # double buffering: dispatch this batch's device work, then
            # consume the PREVIOUS batch while this one computes
            nonlocal pending
            handles = self.dispatch_batch(batch, hw)
            if pending is not None:
                h_prev, n_prev = pending
                emit(self.finish_batch(h_prev, hw)[:n_prev])
            pending = (handles, n_valid)

        def sized(it):
            nonlocal hw
            for frame in it:
                if hw is None:
                    hw = orig_hw or frame.shape[:2]
                yield frame

        frames = sized(frames)
        first = next(frames, None)
        if first is None:
            return out
        batcher = FrameBatcher(self.batch, bucket_for(hw[0], hw[1],
                                                      target_h=184))

        def chain():
            yield first
            yield from frames

        from islx.pipeline.video import Prefetcher

        # decode + bucket-resize in a prefetch thread; device batches are
        # additionally double-buffered by flush()
        for batch, n_valid in Prefetcher(batcher(chain()), depth=2):
            flush(batch, n_valid)
        if pending is not None:
            h_prev, n_prev = pending
            emit(self.finish_batch(h_prev, hw)[:n_prev])
        return out

    def translate_video(self, path: str, yuv: Optional[bool] = None
                        ) -> List[Tuple[int, int, str, float]]:
        """yuv: decode straight to bucketed I420 in ffmpeg and convert on
        device (1.5 bytes/px uploads, islx.ops.yuv). None = auto (use it
        when ffmpeg exists); the BGR path is the fallback. Production
        divergence: ffmpeg's swscale bucketing vs cv2 INTER_CUBIC and 4:2:0
        chroma — <=1px peak movement (PARITY.md #8)."""
        import shutil

        from islx.pipeline.video import FrameSource

        if yuv is None:
            yuv = shutil.which("ffmpeg") is not None
        if yuv:
            return self._translate_video_yuv(path)
        with FrameSource(path) as src:
            return self.translate_frames(src)

    def _translate_video_yuv(self, path: str
                             ) -> List[Tuple[int, int, str, float]]:
        from islx.pipeline.video import YUVFrameSource, probe

        meta = probe(path)
        hw = (meta.height, meta.width)
        hb, wb = bucket_for(hw[0], hw[1], target_h=184)
        with YUVFrameSource(path, (hb, wb)) as src:
            return self.translate_yuv_frames(src, hw, (hb, wb))

    def translate_yuv_frames(self, flat_frames: Iterable[np.ndarray],
                             orig_hw: Tuple[int, int],
                             bucket_hw: Tuple[int, int]
                             ) -> List[Tuple[int, int, str, float]]:
        """Stream flat per-frame I420 buffers (already at ``bucket_hw``) ->
        predictions; the device converts I420->BGR inside the fused program
        (input_format='yuv420'), so frame uploads are 1.5 bytes/px."""
        from islx.pipeline.video import Prefetcher, flat_batches

        self.reset()
        out: List[Tuple[int, int, str, float]] = []
        emit = self._make_emitter(out)
        pending = None
        hb, wb = bucket_hw
        sy, sx = orig_hw[0] / hb, orig_hw[1] / wb

        import time

        def finish(packed, n_valid):
            t0 = time.perf_counter()
            results, boxes, peaks = self.pipe.assemble(
                np.asarray(packed), self.batch)
            self._tick("fetch_group", t0)
            emit(self._features(results, boxes, peaks, sy, sx)[:n_valid])

        for flat, n_valid in Prefetcher(
                flat_batches(iter(flat_frames), self.batch), depth=2):
            t0 = time.perf_counter()
            packed = self.pipe.device_step_flat(
                jnp.asarray(flat), self.batch, hb, wb, orig_hw,
                self.thre1, input_format="yuv420")
            self._tick("dispatch", t0)
            if pending is not None:
                finish(*pending)
            pending = (packed, n_valid)
        if pending is not None:
            finish(*pending)
        return out
