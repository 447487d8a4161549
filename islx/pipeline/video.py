"""Video I/O: frame sources/sinks feeding batched device pipelines.

The reference reads with cv2.VideoCapture / pims and writes raw BGR24 frames
into an ffmpeg stdin pipe, probing metadata with ffprobe
(demo_video.py:18-34,95-117; src/ISL_Model_parameter.py:15-37). Here the same
capabilities sit behind small classes, with an added ``FrameBatcher`` that
groups frames into fixed-size device batches (the throughput unit of
islx.pipeline.batch_pose). ffmpeg/ffprobe are optional: when absent we fall
back to cv2.VideoWriter / cv2.VideoCapture metadata.
"""
from __future__ import annotations

import json
import shutil
import subprocess
from dataclasses import dataclass
from typing import Iterator, List, Sequence, Tuple

import numpy as np


def _have(binary: str) -> bool:
    return shutil.which(binary) is not None


@dataclass
class VideoMeta:
    width: int
    height: int
    fps: float
    codec: str = "unknown"
    pix_fmt: str = "unknown"
    n_frames: int = -1


def probe(path: str) -> VideoMeta:
    """Stream metadata via ffprobe (reference demo_video.py:18-34), cv2
    fallback when ffprobe is unavailable."""
    if _have("ffprobe"):
        cmd = ["ffprobe", "-v", "error", "-select_streams", "v:0",
               "-show_streams", "-print_format", "json", path]
        info = json.loads(subprocess.check_output(cmd).decode())
        s = info["streams"][0]
        num, den = s.get("avg_frame_rate", "30/1").split("/")
        fps = float(num) / float(den) if float(den) else 30.0
        return VideoMeta(width=int(s["width"]), height=int(s["height"]),
                         fps=fps, codec=s.get("codec_name", "unknown"),
                         pix_fmt=s.get("pix_fmt", "unknown"),
                         n_frames=int(s.get("nb_frames", -1)))
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        return VideoMeta(width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                         height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                         fps=cap.get(cv2.CAP_PROP_FPS) or 30.0,
                         n_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)))
    finally:
        cap.release()


class FrameSource:
    """Iterate BGR u8 frames from a video file (cv2.VideoCapture)."""

    def __init__(self, path: str):
        import cv2

        self.path = path
        self.meta = probe(path)
        self._cap = cv2.VideoCapture(path)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ok, frame = self._cap.read()
            if not ok:
                break
            yield frame

    def close(self) -> None:
        self._cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class YUVFrameSource:
    """Decode straight to BUCKETED I420 frames via ffmpeg: yields flat u8
    buffers of ``hb*wb*3/2`` bytes per frame.

    Decode, scale, and 4:2:0 all happen inside the decoder process (video is
    stored 4:2:0 — this is the decoder's native output, the BGR round trip
    the reference pays per frame never happens); the device converts
    I420 -> BGR inside the fused program (islx.ops.yuv). Host->device frame
    traffic drops to 1.5 bytes/px. Requires ffmpeg; callers fall back to
    FrameSource + host bucketing when it is missing.
    """

    def __init__(self, path: str, bucket_hw: Tuple[int, int]):
        if not _have("ffmpeg"):
            raise RuntimeError("YUVFrameSource requires ffmpeg")
        hb, wb = bucket_hw
        assert hb % 2 == 0 and wb % 2 == 0, bucket_hw
        self.path = path
        self.meta = probe(path)
        self.bucket_hw = bucket_hw
        self.frame_bytes = hb * wb * 3 // 2
        cmd = ["ffmpeg", "-v", "error", "-i", path,
               "-vf", f"scale={wb}:{hb}", "-pix_fmt", "yuv420p",
               "-f", "rawvideo", "-"]
        self._proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            buf = self._proc.stdout.read(self.frame_bytes)
            if len(buf) < self.frame_bytes:
                break
            yield np.frombuffer(buf, np.uint8)

    def batches(self, batch: int) -> Iterator[Tuple[np.ndarray, int]]:
        """Yield (flat u8 [batch*frame_bytes], n_valid); the tail batch is
        padded by repeating the last frame (static device shapes)."""
        return flat_batches(self, batch)

    def close(self) -> None:
        if self._proc.poll() is None:
            self._proc.terminate()
        self._proc.wait()
        self._proc.stdout.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def flat_batches(frames: Iterator[np.ndarray], batch: int
                 ) -> Iterator[Tuple[np.ndarray, int]]:
    """Group flat per-frame u8 buffers into (concat [batch*bytes], n_valid)
    device batches; the tail pads by repeating the last frame."""
    buf: List[np.ndarray] = []
    for f in frames:
        buf.append(f)
        if len(buf) == batch:
            yield np.concatenate(buf), batch
            buf.clear()
    if buf:
        n = len(buf)
        while len(buf) < batch:
            buf.append(buf[-1])
        yield np.concatenate(buf), n


class FrameWriter:
    """Write BGR u8 frames to a video file.

    Prefers an async ffmpeg rawvideo pipe (reference Writer,
    demo_video.py:95-117); falls back to cv2.VideoWriter.
    """

    def __init__(self, path: str, fps: float, frame_hw: Tuple[int, int],
                 vcodec: str = "libx264"):
        self.path = path
        h, w = frame_hw
        if _have("ffmpeg"):
            cmd = ["ffmpeg", "-y", "-loglevel", "error",
                   "-f", "rawvideo", "-pix_fmt", "bgr24",
                   "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
                   "-an", "-vcodec", vcodec, path]
            self._proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
            self._cv = None
        else:
            import cv2

            self._proc = None
            self._cv = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))

    def __call__(self, frame: np.ndarray) -> None:
        if self._proc is not None:
            self._proc.stdin.write(frame.tobytes())
        else:
            self._cv.write(frame)

    def close(self) -> None:
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
        else:
            self._cv.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Prefetcher:
    """Run an iterator in a background thread behind a bounded queue.

    Overlaps host video decode/resize with device compute (the async input
    stage of SURVEY §2.3's 'host-side async decode feeding a device prefetch
    queue'). Order-preserving; exceptions in the producer re-raise in the
    consumer. Use as a context manager or rely on exhaustion to join.
    """

    _DONE = object()

    def __init__(self, it, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._exc = None

        def run():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # propagate to the consumer
                self._exc = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                self._thread.join()
                if self._exc is not None:
                    raise self._exc
                return
            yield item

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        # drain so the producer thread can exit
        while self._thread.is_alive():
            try:
                self._q.get_nowait()
            except Exception:
                break
        return False


class FrameBatcher:
    """Group frames into fixed [B,Hb,Wb,3] buckets for device batches.

    Resizes each frame into the stride-aligned bucket (cv2 INTER_CUBIC, the
    same resize the per-image path applies on device) and yields
    (batch u8 [B,Hb,Wb,3], n_valid) — the tail batch is padded by repeating
    the last frame so device shapes stay static.
    """

    def __init__(self, batch: int, bucket_hw: Tuple[int, int]):
        self.batch = batch
        self.bucket_hw = bucket_hw

    def __call__(self, frames: Sequence[np.ndarray] | Iterator[np.ndarray]
                 ) -> Iterator[Tuple[np.ndarray, int]]:
        import cv2

        hb, wb = self.bucket_hw
        buf: List[np.ndarray] = []
        for frame in frames:
            buf.append(cv2.resize(frame, (wb, hb),
                                  interpolation=cv2.INTER_CUBIC))
            if len(buf) == self.batch:
                yield np.stack(buf), self.batch
                buf.clear()
        if buf:
            n = len(buf)
            while len(buf) < self.batch:
                buf.append(buf[-1])
            yield np.stack(buf), n
