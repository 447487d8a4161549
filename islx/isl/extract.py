"""Dataset feature extraction — the offline "training-data build" path.

Re-implements the reference's three extraction pipelines (extract_features.py,
extract_features_mp.py, extract_featuressingle.py / src/dataloader.py) as one
sharded, idempotent, resumable pipeline:

* per frame: pose -> features -> JSON record {candidate, subset,
  all_hand_peaks} + optional stick-figure JPG (reference
  extract_features.py:105-141 outputs)
* crash-resume via output-file existence, like the reference's
  ``is_processed`` (extract_features.py:97-101)
* sharding: deterministic row partition over (shard_index, num_shards) —
  the TPU-native replacement for the reference's mp.Process-per-CSV-chunk
  (extract_features_mp.py:198-221); run one process per host/chip, no queues
* per-video timing + aggregate features.csv + STATUS.csv accounting
  (json_to_pandas.py:50-92)
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from islx.isl import features as F


@dataclass
class ExtractConfig:
    out_root: str
    write_json: bool = True
    write_sticks: bool = False
    window_size: int = 20
    # per-frame augmentation (reference extract_featuressingle.py:49-52:
    # RandomRotation + RandomSolarize); deterministic per (video, frame) so
    # reruns stay idempotent
    augment: bool = False
    augment_degrees: float = 10.0
    solarize_threshold: float = 192.0


def _frame_paths(cfg: ExtractConfig, video_id: str, idx: int):
    d = os.path.join(cfg.out_root, video_id)
    return (os.path.join(d, f"{idx:06d}.json"),
            os.path.join(d, f"{idx:06d}.jpg"))


def is_processed(cfg: ExtractConfig, video_id: str, idx: int) -> bool:
    """Per-frame idempotency marker (reference extract_features.py:97-101)."""
    jp, ip = _frame_paths(cfg, video_id, idx)
    ok = (not cfg.write_json) or os.path.exists(jp)
    return ok and ((not cfg.write_sticks) or os.path.exists(ip))


def save_frame(cfg: ExtractConfig, video_id: str, idx: int,
               candidate: np.ndarray, subset: np.ndarray,
               all_hand_peaks: Sequence[np.ndarray],
               frame: Optional[np.ndarray] = None) -> Dict:
    """Persist one frame's pose record; returns the flat feature row."""
    d = os.path.join(cfg.out_root, video_id)
    os.makedirs(d, exist_ok=True)
    jp, ip = _frame_paths(cfg, video_id, idx)
    record = {
        "candidate": np.asarray(candidate).tolist(),
        "subset": np.asarray(subset).tolist(),
        "all_hand_peaks": [np.asarray(p).tolist() for p in all_hand_peaks],
    }
    if cfg.write_json:
        tmp = jp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, jp)   # write-once atomic, safe under sharded reruns
    if cfg.write_sticks and frame is not None:
        import cv2

        from islx.utils import draw

        circles, sticks = F.get_bodypose(candidate, subset, "body25")
        edges, peaks = F.get_handpose(all_hand_peaks)
        cv2.imwrite(ip, draw.draw_stick_model(frame, circles, sticks,
                                              edges, peaks))
    feat = F.frame_features(candidate, subset, all_hand_peaks, "body25")
    return {"video": video_id, "frame": idx,
            **{f"f{i}": float(v) for i, v in enumerate(feat)}}


def extract_video(cfg: ExtractConfig, pose, video_path: str,
                  video_id: Optional[str] = None) -> List[Dict]:
    """Run pose over every frame of one video (resumable)."""
    from islx.pipeline.video import FrameSource, Prefetcher

    video_id = video_id or os.path.basename(video_path)
    rows: List[Dict] = []
    t0 = time.time()
    with FrameSource(video_path) as src:

        def decoded():
            """Decode + augment in the prefetch thread: pose (device) and
            the next frame's decode overlap."""
            for idx, frame in enumerate(src):
                if is_processed(cfg, video_id, idx):
                    continue
                if cfg.augment:
                    frame = _augment_frame(cfg, video_id, idx, frame)
                yield idx, frame

        for idx, frame in Prefetcher(decoded(), depth=4):
            candidate, subset, hands = pose(frame)
            rows.append(save_frame(cfg, video_id, idx, candidate, subset,
                                   hands, frame))
    if rows:
        rows[-1]["exec_time_s"] = time.time() - t0
    return rows


def extract_video_batched(cfg: ExtractConfig, pipe, video_path: str,
                          video_id: Optional[str] = None,
                          batch: int = 16) -> List[Dict]:
    """Batched extraction: frames flow through the FUSED pose program
    (islx.pipeline.batch_pose.FusedPosePipeline) one batch at a time — one
    upload + one fetch per ``batch`` frames instead of the per-frame
    transfers of :func:`extract_video`. Decode/augment/bucket run in a
    prefetch thread and device batches are double-buffered, so decode, the
    device program and the JSON writes all overlap. Output records are
    identical to the per-frame path (same save_frame contract).
    """
    import cv2

    from islx.pipeline.batch_pose import bucket_for
    from islx.pipeline.video import FrameSource, Prefetcher

    video_id = video_id or os.path.basename(video_path)
    rows: List[Dict] = []
    t0 = time.time()
    with FrameSource(video_path) as src:
        h0, w0 = src.meta.height, src.meta.width
        hb, wb = bucket_for(h0, w0)
        sy, sx = h0 / hb, w0 / wb

        def batches():
            """Decode + augment + bucket-resize in the prefetch thread."""
            buf = []

            def packed(items):
                arr = np.empty((batch, hb, wb, 3), np.uint8)
                for i, (_, f) in enumerate(items):
                    arr[i] = cv2.resize(f, (wb, hb),
                                        interpolation=cv2.INTER_CUBIC)
                for i in range(len(items), batch):
                    arr[i] = arr[0]
                return arr, items

            for idx, frame in enumerate(src):
                if is_processed(cfg, video_id, idx):
                    continue
                if cfg.augment:
                    frame = _augment_frame(cfg, video_id, idx, frame)
                buf.append((idx, frame))
                if len(buf) == batch:
                    yield packed(buf)
                    buf = []
            if buf:
                yield packed(buf)

        def consume(handle, items):
            results, boxes, peaks = pipe.assemble(handle, batch)
            for i, (idx, frame) in enumerate(items):
                candidate, subset = results[i]
                if candidate.shape[0]:
                    candidate = candidate.copy()
                    candidate[:, 0] *= sx
                    candidate[:, 1] *= sy
                hands = pipe.hands_for_frame(boxes, peaks, i, sy, sx)
                rows.append(save_frame(cfg, video_id, idx, candidate,
                                       subset, hands, frame))

        pending = None
        for arr, items in Prefetcher(batches(), depth=2):
            handle = pipe.device_step_flat(pipe.upload_frames(arr),
                                           batch, hb, wb, (h0, w0))
            if pending is not None:
                consume(*pending)
            pending = (handle, items)
        if pending is not None:
            consume(*pending)
    if rows:
        rows[-1]["exec_time_s"] = time.time() - t0
    return rows


def _augment_frame(cfg: ExtractConfig, video_id: str, idx: int,
                   frame: np.ndarray) -> np.ndarray:
    """Deterministic per-frame rotate+solarize (islx.ops.augment)."""
    import zlib

    import jax.numpy as jnp

    from islx.ops.augment import rotate_nearest, solarize

    # crc32, NOT hash(): python's hash is salted per process and would break
    # the idempotent-resume contract
    seed = zlib.crc32(f"{video_id}/{idx}".encode()) & 0x7FFFFFFF
    rs = np.random.RandomState(seed)
    deg = rs.uniform(-cfg.augment_degrees, cfg.augment_degrees)
    out = rotate_nearest(jnp.asarray(frame), jnp.float32(deg))
    if rs.rand() < 0.5:
        out = solarize(out, cfg.solarize_threshold)
    return np.asarray(out).astype(frame.dtype)


def shard_rows(rows: Sequence, shard_index: int, num_shards: int) -> List:
    """Deterministic row partition (replaces extract_features_mp.py:198-201)."""
    return [r for i, r in enumerate(rows) if i % num_shards == shard_index]


def extract_dataset(cfg: ExtractConfig, pose, csv_path: str,
                    shard_index: int = 0, num_shards: int = 1,
                    path_col: str = "Filepath",
                    batch: Optional[int] = None) -> str:
    """Extract features for every video in an INCLUDE-style CSV shard.

    ``pose``: a per-frame callable (ImagePose/ISLSignPos) — or, with
    ``batch`` set, a FusedPosePipeline driven through
    :func:`extract_video_batched`. Writes ``features-shard{i}.csv`` under
    out_root; aggregate with :func:`islx.isl.dataset.build_table`.
    """
    import pandas as pd

    df = pd.read_csv(csv_path)
    my_rows = shard_rows(list(df.itertuples(index=False)), shard_index,
                         num_shards)
    all_rows: List[Dict] = []
    for row in my_rows:
        path = getattr(row, path_col)
        meta = {c: getattr(row, c) for c in df.columns if c != path_col}
        rows = (extract_video_batched(cfg, pose, path, batch=batch)
                if batch else extract_video(cfg, pose, path))
        for r in rows:
            r.update(meta)
            all_rows.append(r)
    out = os.path.join(cfg.out_root, f"features-shard{shard_index}.csv")
    pd.DataFrame(all_rows).to_csv(out, index=False)
    return out
