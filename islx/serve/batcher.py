"""Dynamic micro-batching for the fused pose program.

Production serving on TPU wants LARGE batches (the fixed per-dispatch RPC
and upload costs amortize over device work — docs/PERFORMANCE.md), but
requests arrive one at a time. The MicroBatcher bridges the two: callers
submit single frames and block on a future; a worker thread drains the queue
every ``max_wait_ms`` (or as soon as ``max_batch`` requests are pending),
groups requests by input resolution (one compiled program per distinct
resolution — static shapes, XLA's compilation model), pads the batch to the
fixed program shape and runs ONE FusedPosePipeline step for the whole group.

The reference has no serving story at all (its demos are synchronous
per-frame loops, e.g. demo_camera.py:27-41); this subsystem is part of the
"production deployment" surface of the rebuild.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from typing import Dict, Optional, Tuple

import numpy as np


class PoseResult:
    __slots__ = ("candidate", "subset", "hands")

    def __init__(self, candidate, subset, hands):
        self.candidate = candidate
        self.subset = subset
        self.hands = hands


class MicroBatcher:
    """Submit frames, get back futures resolving to PoseResult."""

    _CALIB_KEEP = 32      # calibration sample cap (frames kept in memory)
    _CALIB_CHUNK = 8      # frames per eager calibration forward (HBM bound)

    def __init__(self, pipe, max_batch: int = 8, max_wait_ms: float = 15.0,
                 target_h: int = 184,
                 quantize_after: Optional[int] = None,
                 max_resolutions: int = 8,
                 aot_dir: Optional[str] = None):
        from collections import OrderedDict

        from islx.pipeline.batch_pose import bucket_for

        self.pipe = pipe
        # AOT warm start: install pre-compiled program artifacts
        # (islx.core.aot, python -m islx.cli.export_programs) so the first
        # request at an exported (batch, resolution) dispatches immediately
        # instead of paying the 20-40s in-process compile
        self.aot_loaded: list = []
        if aot_dir:
            from islx.core import aot

            self.aot_loaded = aot.preload_dir(pipe, aot_dir, verbose=True)
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1000.0
        self.target_h = target_h
        # bounded per-resolution program cache: mixed-resolution traffic
        # compiles one program per distinct bucket; beyond this many live
        # buckets the least-recently-served one's programs are evicted
        # (recompiled on demand if that resolution returns)
        self.max_resolutions = int(max_resolutions)
        self._res_lru: "OrderedDict[Tuple[int, int], None]" = OrderedDict()
        # live-traffic int8 calibration: after `quantize_after` served
        # frames, calibrate activation scales on the stored traffic and swap
        # in W8A8 trunks (islx.models.quant) — the production pattern for a
        # deployment with no offline calibration set. None = stay float.
        self.quantize_after = quantize_after
        # bounded calibration sample: activation scales need a SAMPLE of the
        # traffic, not all of it — keep at most _CALIB_KEEP frames and count
        # served frames separately (so --int8-after 512 doesn't build a
        # 512-frame eager calibration batch and OOM the chip)
        self._calib_frames: list = []
        self._calib_hw0: Optional[Tuple[int, int]] = None
        self._calib_seen = 0
        # background quantization swap: the quantize -> compile -> warm
        # chain runs off-thread and the worker flips to the finished
        # pipeline between batches, so no request pays the ~20s compile
        self._quant_started = False
        self._quant_thread: Optional[threading.Thread] = None
        self._pending_pipe = None
        self._pending_lock = threading.Lock()
        self._bucket_for = bucket_for
        self._q: "queue.Queue[Tuple[np.ndarray, Future]]" = queue.Queue()
        self._stats = {"requests": 0, "batches": 0, "frames_padded": 0,
                       "quantized": False}
        # per-REQUEST latency (submit -> result set), rolling window: the
        # number an operator actually experiences per call, as opposed to
        # the per-batch device period bench.py records (VERDICT r4 #5)
        from collections import deque

        self._latencies_ms: "deque[float]" = deque(maxlen=2048)
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------

    def submit(self, frame_bgr_u8: np.ndarray) -> "Future[PoseResult]":
        """Non-blocking: returns a future with the frame's PoseResult."""
        fut: Future = Future()
        fut._islx_t0 = time.monotonic()   # request-latency clock start
        if self._stop.is_set():
            # a submit racing (or following) close() must fail fast — the
            # worker is gone and nothing would ever resolve the future
            fut.set_exception(RuntimeError("MicroBatcher closed"))
            return fut
        self._q.put((np.asarray(frame_bgr_u8), fut))
        with self._stats_lock:
            self._stats["requests"] += 1
        return fut

    def pose(self, frame_bgr_u8: np.ndarray,
             timeout: Optional[float] = None) -> PoseResult:
        """Blocking convenience wrapper."""
        return self.submit(frame_bgr_u8).result(timeout)

    def stats(self) -> Dict[str, float]:
        with self._stats_lock:
            out = dict(self._stats)
            lats = sorted(self._latencies_ms)
        if lats:
            out["latency_ms_p50_request"] = round(
                lats[len(lats) // 2], 1)
            out["latency_ms_p99_request"] = round(
                lats[min(int(len(lats) * 0.99), len(lats) - 1)], 1)
            out["latency_window_n"] = len(lats)
        return out

    def close(self) -> None:
        self._stop.set()
        self._worker.join(timeout=5.0)
        # the background quantize thread runs eager JAX; left alive past
        # close() it races whatever the process does next (measured: an
        # XLA abort when a later test ran a mesh computation while a leaked
        # calibration thread was mid-forward). It checks _stop between
        # calibration chunks and between warm-compile keys, so the join is
        # bounded by one chunk or one compile+warm step (~20-40s) — the
        # 120s timeout covers that; a wedged-relay fetch can still exceed
        # it, in which case the join returns with the thread leaked (the
        # caller should not run further device work in that process).
        t = self._quant_thread
        if t is not None:
            t.join(timeout=120.0)
        # fail any request the worker never picked up — a submit() racing
        # shutdown must not leave its caller blocked forever
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("MicroBatcher closed"))

    # ------------------------------------------------------------------

    def _run(self) -> None:
        pending = []   # spilled other-resolution requests, FIFO, served
        # ahead of the queue so sustained majority-resolution traffic
        # cannot starve a minority-resolution request
        while not self._stop.is_set():
            if pending:
                first = pending.pop(0)
            else:
                try:
                    first = self._q.get(timeout=0.1)
                except queue.Empty:
                    continue
                # batching window — ends early the moment a full batch is
                # pending (a burst arriving mid-wait must not eat the whole
                # window; 1ms poll granularity vs the 15ms default window)
                deadline = time.monotonic() + self.max_wait
                while (self._q.qsize() < self.max_batch - 1
                       and not self._stop.is_set()):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._stop.wait(min(left, 0.001))
            # drain: same-resolution requests batch together; others wait
            # in `pending` for the next cycle (they'd need another program)
            hw0 = first[0].shape[:2]
            batch = [first]
            i = 0
            while len(batch) < self.max_batch and i < len(pending):
                if pending[i][0].shape[:2] == hw0:
                    batch.append(pending.pop(i))
                else:
                    i += 1
            while len(batch) < self.max_batch:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item[0].shape[:2] == hw0:
                    batch.append(item)
                else:
                    pending.append(item)
            try:
                self._process(batch, hw0)
            except Exception as exc:  # resolve futures, keep serving
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(exc)
        # shutdown: fail spilled requests the loop never served
        for _, fut in pending:
            if not fut.done():
                fut.set_exception(RuntimeError("MicroBatcher closed"))

    def _process(self, batch, hw0) -> None:
        import cv2

        # flip to a background-compiled quantized pipeline between batches
        with self._pending_lock:
            if self._pending_pipe is not None:
                self.pipe = self._pending_pipe
                self._pending_pipe = None
                with self._stats_lock:
                    self._stats["quantized"] = True

        h0, w0 = hw0
        hb, wb = self._bucket_for(h0, w0, target_h=self.target_h)
        self._touch_resolution(hb, wb)
        frames = np.empty((self.max_batch, hb, wb, 3), np.uint8)
        for i, (frame, _) in enumerate(batch):
            frames[i] = cv2.resize(frame, (wb, hb),
                                   interpolation=cv2.INTER_CUBIC)
        for i in range(len(batch), self.max_batch):  # pad to program shape
            frames[i] = frames[0]
        if self.quantize_after is not None and not self._quant_started:
            self._calib_seen += len(batch)
            # calibration frames must share one shape (np.stack); under
            # mixed-resolution traffic, collect only the first-seen shape
            if (not self._calib_frames
                    or self._calib_frames[0].shape == frames[0].shape):
                if not self._calib_frames:
                    # remember the ORIGINAL resolution the calibration
                    # frames came from: sy/sx bake into the program key,
                    # so the background warm must compile the key REAL
                    # traffic at this resolution dispatches — warming a
                    # synthetic (bucket, sy=1) key would leave the first
                    # post-swap request paying the full compile
                    self._calib_hw0 = hw0
                room = self._CALIB_KEEP - len(self._calib_frames)
                self._calib_frames.extend(frames[i]
                                          for i in range(min(len(batch),
                                                             max(room, 0))))
            if self._calib_seen >= self.quantize_after:
                self._quant_started = True
                calib = self._calib_frames
                self._calib_frames = []
                self._quant_thread = threading.Thread(
                    target=self._background_quantize,
                    args=(calib, self._calib_hw0), daemon=True)
                self._quant_thread.start()
        packed = self.pipe.device_step(frames, (h0, w0))
        results, boxes, peaks = self.pipe.assemble(packed, self.max_batch)
        sy, sx = h0 / hb, w0 / wb
        for i, (_, fut) in enumerate(batch):
            candidate, subset = results[i]
            if candidate.shape[0]:
                candidate = candidate.copy()
                candidate[:, 0] *= sx
                candidate[:, 1] *= sy
            hands = self.pipe.hands_for_frame(boxes, peaks, i, sy, sx)
            # a client may have cancelled its future while the batch ran;
            # set_result on it raises and would poison the REST of the
            # batch via _run's except handler
            if not fut.done():
                try:
                    fut.set_result(PoseResult(candidate, subset, hands))
                except InvalidStateError:   # lost the race to a cancel
                    pass
                else:
                    lat = (time.monotonic()
                           - getattr(fut, "_islx_t0", np.nan)) * 1e3
                    with self._stats_lock:
                        self._latencies_ms.append(lat)
        with self._stats_lock:
            self._stats["batches"] += 1
            self._stats["frames_padded"] += self.max_batch - len(batch)

    def _touch_resolution(self, hb: int, wb: int) -> None:
        """LRU-track served buckets; evict the stalest bucket's compiled
        programs once more than ``max_resolutions`` are live."""
        self._res_lru[(hb, wb)] = None
        self._res_lru.move_to_end((hb, wb))
        while len(self._res_lru) > self.max_resolutions:
            (ehb, ewb), _ = self._res_lru.popitem(last=False)
            self.pipe.drop_programs(ehb, ewb)
            with self._stats_lock:
                self._stats["programs_evicted"] = (
                    self._stats.get("programs_evicted", 0) + 1)

    def _background_quantize(self, calib_frames, cal_hw0) -> None:
        """Calibrate on stored live frames, build the int8 pipeline, and
        PRE-COMPILE + warm it before handing it to the worker — no request
        ever waits on the swap's compile (the old float pipeline keeps
        serving until the new one is hot). The hand net calibrates on
        whole-frame resizes as crop proxies (same pixel statistics)."""
        import cv2

        from islx.models import quant
        from islx.pipeline.batch_pose import FusedPosePipeline

        class _Cancelled(Exception):
            pass

        def chunks_until_close(arr):
            # abort between chunks when close() has been called: a leaked
            # calibration thread doing eager forwards races whatever the
            # process runs next (see close())
            for i in range(0, len(arr), self._CALIB_CHUNK):
                if self._stop.is_set():
                    raise _Cancelled()
                yield arr[i:i + self._CALIB_CHUNK]

        try:
            old = self.pipe
            xcal = np.stack(calib_frames).astype(np.float32) / 256.0 - 0.5
            size = int(np.rint(old.hand.cfg.scale_search[0]
                               * old.hand.cfg.boxsize))
            hcal = np.stack([
                cv2.resize(f, (size, size), interpolation=cv2.INTER_CUBIC)
                for f in calib_frames]).astype(np.float32) / 256.0 - 0.5
            # chunked eager forwards: a single big batch at the hand net's
            # full-resolution activations would blow HBM
            cd = old.body.compute_dtype
            bq = quant.quantize_model(old.body.params, old.model_type,
                                      chunks_until_close(xcal),
                                      compute_dtype=cd)
            hq = quant.quantize_model(old.hand.params, "hand",
                                      chunks_until_close(hcal),
                                      compute_dtype=cd)
            new_pipe = FusedPosePipeline(
                bq, hq, old.model_type, old.body.cfg, old.hand.cfg,
                det_cfg=old.det_cfg, compute_dtype=cd, top_m=old.body.top_m,
                crop_chunk=old.hand.crop_chunk, mesh=old.mesh)
            if self._stop.is_set():
                return
            # compile + warm EVERY program key the float pipeline served
            # (one dummy step each, fetched) so the worker's flip is
            # instantaneous for all live resolutions, not just the
            # calibration one — the swap replaces the whole pipeline and a
            # mixed-resolution deployment would otherwise stall 20-40s per
            # other bucket on its first post-swap request
            ch, cw = calib_frames[0].shape[:2]
            keys = [(self.max_batch, ch, cw,
                     float(cal_hw0[0]) / ch, float(cal_hw0[1]) / cw, "bgr")]
            keys += [k for k in old._programs if k not in keys]
            import jax.numpy as jnp

            for b_, hb_, wb_, sy_, sx_, fmt_ in keys:
                if self._stop.is_set():
                    return
                n = b_ * hb_ * wb_ * 3
                if fmt_ == "yuv420":
                    n = b_ * (hb_ * wb_ * 3) // 2
                np.asarray(new_pipe._program(b_, hb_, wb_, sy_, sx_, fmt_)(
                    new_pipe.body.params, new_pipe.hand.params,
                    jnp.zeros(n, jnp.uint8),
                    jnp.float32(new_pipe.body.cfg.thre1)))
            with self._pending_lock:
                self._pending_pipe = new_pipe
        except _Cancelled:
            return
        except Exception:
            # a failed swap must not poison serving: stay float
            self.quantize_after = None
