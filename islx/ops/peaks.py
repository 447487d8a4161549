"""Body-joint peak extraction (gaussian NMS), fully on device.

Replaces the reference's per-channel host loop (src/body.py:86-107: scipy
gaussian_filter + four shifted-array comparisons + np.nonzero) with one jitted
program over all joint channels:

    blur (2 MXU matmuls) -> 4-neighbour NMS (VPU) -> static top-K per channel.

Peak order matches the reference exactly: row-major (y, then x) within each
channel — np.nonzero order — achieved by top-K over negated flat indices.
Ragged python lists become fixed-K arrays with validity masks (XLA needs
static shapes); K=32 comfortably exceeds any realistic per-joint people count.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from islx.ops.blur import gaussian_blur


class Peaks(NamedTuple):
    """Fixed-size peak set per channel.

    xy:    [C, K, 2] int32 (x, y) coordinates, row-major order per channel
    score: [C, K] float32 — value of the UNBLURRED averaged heatmap at (y, x)
    valid: [C, K] bool
    count: [C] int32
    """

    xy: jax.Array
    score: jax.Array
    valid: jax.Array
    count: jax.Array


def _nms_mask(b: jax.Array, thre1: float) -> jax.Array:
    """4-neighbour plateau NMS (reference semantics: src/body.py:90-100).

    b: [H,W,C] blurred heatmaps. Out-of-image neighbours compare as 0.

    Formulated as two 3-wide max-pools instead of four shifted copies:
    ``b >= max3_vertical(b)`` ⟺ ``b >= up & b >= down`` (b >= b always),
    and the -inf pool padding is equivalent to the reference's zero padding
    because ``b > thre1`` with thre1 > 0 (reference default 0.1,
    src/body.py:44) already implies ``b >= 0`` at borders. The shifted-copy
    form profiled at ~5.4ms/step on the B=192 bench program (XLA
    materialized two f32[B,H-1,W,C]-sized tuples); pools fuse.
    """
    neg = jnp.array(-jnp.inf, b.dtype)
    mv = jax.lax.reduce_window(b, neg, jax.lax.max, (3, 1, 1), (1, 1, 1),
                               "SAME")
    mh = jax.lax.reduce_window(b, neg, jax.lax.max, (1, 3, 1), (1, 1, 1),
                               "SAME")
    return (b >= mv) & (b >= mh) & (b > thre1)


def _first_k_masked(flat_mask: jax.Array, k: int,
                    two_stage: bool = True) -> jax.Array:
    """First k True positions per row of a [C, N] bool mask, ascending
    (row-major peak order); empty slots hold the sentinel N.

    Sort-free selection: XLA lowers top_k over wide rows to a full sort
    network (measured 19ms for [32,25,45632] inside the batched body
    program). Instead, rank every position with a cumulative count and
    binary-search the jump points — cumsum is a blocked parallel prefix
    (~5ms on the same shape) and the k searches are O(log N) gathers.
    Exact for ANY peak layout (the old two-stage block top-k silently
    truncated >8 peaks per 2048 block; ``two_stage`` is kept for API
    compatibility and ignored).
    """
    del two_stage
    c, n = flat_mask.shape
    rank = jnp.cumsum(flat_mask.astype(jnp.int32), axis=-1)   # [C, N]
    q = jnp.arange(1, k + 1, dtype=jnp.int32)
    # first position where rank reaches j (j = 1..k) == the j-th True index.
    # method="compare_all" lowers to a vectorized compare+reduce instead of
    # the default binary-search scan, which on TPU becomes a sequential
    # while loop (profiled at 7.4ms/step on the 64-frame fused program vs
    # sub-ms for the fused compare+reduce); results are identical.
    idx = jax.vmap(lambda r: jnp.searchsorted(r, q, side="left",
                                              method="compare_all"))(rank)
    count = rank[:, -1]
    return jnp.where(q[None, :] <= count[:, None], idx.astype(jnp.int32), n)


def _first_k_masked_rows(mask: jax.Array, k: int,
                         row_cnt: Optional[jax.Array] = None) -> jax.Array:
    """Row-blocked exact equivalent of :func:`_first_k_masked`.

    mask: [C, H, W] bool -> [C, K] ascending flat (y*W+x) indices of the
    first k True positions per channel, sentinel H*W beyond the count.

    The flat-rank chain materializes an s32 cumsum the size of the heatmaps
    ([B,C,H,W] = 452MB on the B=192 bench program) and compare_all reads it
    K times (~7GB of HBM traffic, ~21ms/step profiled). Rows are natural
    blocks (W=128 = one lane tile): per-row counts reduce-fuse into the mask
    producer, the row prefix is a [C,H] cumsum, each query binary-searches
    H entries, and only the K hit rows ([C,K,W]) are gathered and locally
    scanned. Exact for any peak layout — no per-block truncation (unlike the
    old two-stage block top-k this replaces the second time around).
    """
    c, h, w = mask.shape
    n = h * w
    if row_cnt is None:
        row_cnt = (mask != 0).astype(jnp.int32).sum(axis=2)  # [C,H] (fused)
    row_pre = jnp.cumsum(row_cnt, axis=1)                   # inclusive [C,H]
    q = jnp.arange(1, k + 1, dtype=jnp.int32)               # [K]
    row = jax.vmap(lambda r: jnp.searchsorted(
        r, q, side="left", method="compare_all"))(row_pre)  # [C,K] in 0..H
    count = row_pre[:, -1]
    rowc = jnp.minimum(row, h - 1)
    before = jnp.take_along_axis(row_pre, jnp.maximum(rowc - 1, 0), axis=1)
    excl = jnp.where(rowc > 0, before, 0)                   # peaks before row
    target = q[None, :] - excl                              # 1-based in row
    rows_b = jnp.take_along_axis(mask, rowc[:, :, None], axis=1) != 0
    local = jnp.cumsum(rows_b.astype(jnp.int32), axis=2)    # [C,K,W]
    hit = (local == target[:, :, None]) & rows_b
    wpos = jnp.argmax(hit, axis=2).astype(jnp.int32)        # first True
    idx = rowc * w + wpos
    return jnp.where(q[None, :] <= count[:, None], idx.astype(jnp.int32), n)


def _select_peaks(mask_hwc: jax.Array, k: int,
                  select: Optional[str] = None) -> jax.Array:
    """[H,W,C] NMS mask -> [C,K] first-k flat indices (sentinel H*W).

    Dispatches between the row-blocked selection (``"rows"``, default) and
    the flat rank/cumsum chain (``"flat"``, kept for A/B profiling —
    tools/tpu_validate.py peaksel). ``select=None`` reads
    ``ISLX_PEAKS_SELECT`` at trace time; pipelines resolve it explicitly so
    the mode lands in their jit cache keys (an env read inside an
    already-cached inner jit is silently ignored)."""
    if select is None:
        select = os.environ.get("ISLX_PEAKS_SELECT", "rows")
    h, w, c = mask_hwc.shape
    if select == "flat":
        return _first_k_masked(mask_hwc.transpose(2, 0, 1).reshape(c, h * w),
                               k)
    return _first_k_masked_rows(mask_hwc.transpose(2, 0, 1), k)


@functools.lru_cache(maxsize=256)
def _blurred_upsample_matrix(n_in: int, n_out: int, sigma: float,
                             truncate: float = 4.0):
    """Fold gaussian blur into the cubic upsample: blur(resize(x)) =
    (B @ R) x (R' @ B')ᵀ — one [n_out, n_in] matrix per axis, built in f64.

    This is the TPU-native form of the reference's epilogue
    (src/body.py:70,88: cv2 x8 cubic upsample THEN scipy gaussian_filter):
    both operators are linear and separable, so their composition is a single
    dense matrix and the unblurred full-resolution heatmap is never
    materialized.
    """
    from islx.ops.blur import _blur_matrix
    from islx.ops.resize import _resize_matrix

    b = _blur_matrix(n_out, sigma, truncate).astype(np.float64)
    r = _resize_matrix(n_in, n_out).astype(np.float64)
    return (b @ r).astype(np.float32)


@functools.lru_cache(maxsize=1024)
def _pyramid_axis_fold(n_bucket: int, n_scaled: int, n8_padded: int,
                       stride: int = 8, sigma: float = 0.0,
                       truncate: float = 4.0) -> np.ndarray:
    """One axis of the reference's per-scale map chain as a single matrix:

        x8 cubic upsample (n8_padded -> n8_padded*stride)
        -> crop the stride padding (first n_scaled rows)
        -> cubic resize back to the bucket (n_scaled -> n_bucket)
        [-> gaussian blur (sigma > 0)]

    (reference src/body.py:69-78 + gaussian_filter :88). All stages are
    linear and separable, so multi-scale averaging of full-resolution maps
    never materializes per-scale full-res tensors: each scale contributes
    one [n_bucket, n8_padded] matmul.
    """
    from islx.ops.blur import _blur_matrix
    from islx.ops.resize import _resize_matrix

    up = _resize_matrix(n8_padded, n8_padded * stride).astype(np.float64)
    m = up[:n_scaled]
    if n_scaled != n_bucket:
        m = _resize_matrix(n_scaled, n_bucket).astype(np.float64) @ m
    if sigma > 0:
        m = _blur_matrix(n_bucket, sigma, truncate).astype(np.float64) @ m
    return m.astype(np.float32)


def find_peaks_pyramid(heat8s, folds, weights, thre1, k: int,
                       two_stage: bool = True,
                       select: Optional[str] = None) -> Peaks:
    """Multi-scale fused peak extraction.

    heat8s:  per-scale NET-resolution heatmaps [h8p_s, w8p_s, C]
    folds:   per-scale ((fh_blur, fw_blur), (fh, fw)) jnp matrices from
             :func:`_pyramid_axis_fold` (with/without the blur folded)
    weights: per-scale averaging weights (1/n, or the reference's buggy
             2^(n-1-s)/n series under ref_compat_averaging)

    The blurred bucket-resolution average is built directly from the net
    outputs (one matmul pair per scale); peak scores are the UNBLURRED
    averaged values reconstructed exactly at the K peaks. Trace-time loop —
    call inside a jitted program.
    """
    hi = jax.lax.Precision.HIGHEST
    blurred = None
    for h8, ((fhb, fwb), _), w in zip(heat8s, folds, weights):
        x = jnp.einsum("oh,hwc->owc", fhb, h8.astype(jnp.float32),
                       precision=hi)
        x = jnp.einsum("pw,owc->opc", fwb, x, precision=hi) * w
        blurred = x if blurred is None else blurred + x
    h_out, w_out, c = blurred.shape

    mask = _nms_mask(blurred, thre1)
    del two_stage
    idx = _select_peaks(mask, k, select)
    valid = idx < h_out * w_out
    idx = jnp.where(valid, idx, 0)
    y = idx // w_out
    x_ = idx % w_out

    score = None
    for h8, (_, (fh, fw)), w in zip(heat8s, folds, weights):
        rows = jnp.take(fh, y, axis=0)                  # [C, K, h8p]
        cols = jnp.take(fw, x_, axis=0)                 # [C, K, w8p]
        s = jnp.einsum("cki,ijc,ckj->ck", rows, h8.astype(jnp.float32),
                       cols, precision=hi) * w
        score = s if score is None else score + s
    score = jnp.where(valid, score, 0.0)
    xy = jnp.stack([x_, y], axis=-1).astype(jnp.int32)
    count = valid.sum(axis=1).astype(jnp.int32)
    return Peaks(xy=xy, score=score, valid=valid, count=count)


@functools.partial(jax.jit, static_argnums=(1, 2, 4, 5, 6, 7))
def find_peaks_fused(heat8: jax.Array, h_out: int, w_out: int,
                     thre1: float, k: int = 32, sigma: float = 3.0,
                     two_stage: bool = True,
                     select: Optional[str] = None) -> Peaks:
    """Fused epilogue: NET-resolution heatmaps -> peaks at full resolution.

    heat8: [h8, w8, C] (joint channels only). Equivalent to
    ``find_peaks(resize_cubic(heat8, h_out, w_out), ...)`` but:

    * the blur folds into the upsample (see ``_blurred_upsample_matrix``), so
      the epilogue runs TWO small matmuls total instead of four full-res ones;
    * peak scores (values of the UNBLURRED upsampled map, src/body.py:103)
      are reconstructed exactly at the K peaks from heat8 with the same cubic
      row/col weights — a [C,K]-sized contraction instead of a second
      [h_out, w_out, C] map.

    Positions can differ from the unfused path only where f32 rounding flips
    a near-exact NMS tie (production path; the parity path keeps the unfused
    order).
    """
    from islx.ops.resize import _resize_matrix

    h8, w8, c = heat8.shape
    fh = jnp.asarray(_blurred_upsample_matrix(h8, h_out, sigma))
    fw = jnp.asarray(_blurred_upsample_matrix(w8, w_out, sigma))
    hi = jax.lax.Precision.HIGHEST
    x = heat8.astype(jnp.float32)
    blurred = jnp.einsum("oh,hwc->owc", fh, x, precision=hi)
    blurred = jnp.einsum("pw,owc->opc", fw, blurred, precision=hi)

    mask = _nms_mask(blurred, thre1)
    del two_stage
    idx = _select_peaks(mask, k, select)
    valid = idx < h_out * w_out
    idx = jnp.where(valid, idx, 0)
    y = idx // w_out
    x_ = idx % w_out

    # exact unblurred cubic values at the peaks: Ry[y] @ heat8[:,:,c] @ Cx[x]
    ry = jnp.asarray(_resize_matrix(h8, h_out))      # [h_out, h8]
    cx = jnp.asarray(_resize_matrix(w8, w_out))      # [w_out, w8]
    rows = jnp.take(ry, y, axis=0)                   # [C, K, h8]
    cols = jnp.take(cx, x_, axis=0)                  # [C, K, w8]
    score = jnp.einsum("cki,ijc,ckj->ck", rows, heat8.astype(jnp.float32),
                       cols, precision=hi)
    score = jnp.where(valid, score, 0.0)
    xy = jnp.stack([x_, y], axis=-1).astype(jnp.int32)
    count = valid.sum(axis=1).astype(jnp.int32)
    return Peaks(xy=xy, score=score, valid=valid, count=count)


@functools.partial(jax.jit, static_argnums=(1, 2, 4, 5, 6, 7))
def find_peaks_fused_batched(heat8: jax.Array, h_out: int, w_out: int,
                             thre1, k: int = 32, sigma: float = 3.0,
                             interpret: Optional[bool] = None,
                             kernel: str = "select") -> Peaks:
    """Batched ``find_peaks_fused`` with the NMS epilogue as a Pallas VMEM
    pass (islx.ops.pallas_peaks).

    heat8: [B,h8,w8,C] -> batched Peaks. Same contract as
    ``jax.vmap(find_peaks_fused)`` — the blur∘upsample matmul pair and the
    peak-score reconstruction are the identical einsums; only the NMS/
    selection between them changes implementation:

    * ``kernel="mask"`` (production TPU default via pipelines): only the
      bandwidth-bound part runs in VMEM (nms_mask_rows: one read of the
      blurred maps -> u8 mask + row counts, replacing two f32 reduce-window
      pools + mask + row-count reduce that re-read them ~5x from HBM);
      selection stays the exact XLA row-blocked chain.
    * ``kernel="select"``: the full NMS+first-K kernel (nms_first_k) — the
      K sequential VMEM min-extractions measured SLOWER than the XLA
      epilogue (docs/PERFORMANCE.md); kept as a validated alternate.

    Positions can differ from the unfused path only where f32 rounding flips
    a near-exact NMS tie (same caveat as find_peaks_fused).
    """
    from islx.ops.pallas_peaks import nms_first_k, nms_mask_rows
    from islx.ops.resize import _resize_matrix

    bsz, h8, w8, c = heat8.shape
    fh = jnp.asarray(_blurred_upsample_matrix(h8, h_out, sigma))
    fw = jnp.asarray(_blurred_upsample_matrix(w8, w_out, sigma))
    hi = jax.lax.Precision.HIGHEST
    x = heat8.astype(jnp.float32)
    t = jnp.einsum("oh,bhwc->bowc", fh, x, precision=hi)
    blurred = jnp.einsum("pw,bowc->bcop", fw, t, precision=hi)  # [B,C,H,W]

    if interpret is None:  # Mosaic kernels only compile for TPU
        interpret = jax.default_backend() != "tpu"
    n = h_out * w_out
    if kernel == "mask":
        mask, row_cnt = nms_mask_rows(
            blurred, jnp.asarray(thre1, jnp.float32), interpret=interpret)
        idx = jax.vmap(lambda m, rc: _first_k_masked_rows(m, k, rc))(
            mask, row_cnt)                                      # [B,C,K]
    else:
        idx = nms_first_k(blurred, jnp.asarray(thre1, jnp.float32), k,
                          interpret=interpret)                  # [B,C,K]
    valid = idx < n
    idx = jnp.where(valid, idx, 0)
    y = idx // w_out
    x_ = idx % w_out

    ry = jnp.asarray(_resize_matrix(h8, h_out))
    cx = jnp.asarray(_resize_matrix(w8, w_out))
    rows = jnp.take(ry, y, axis=0)                   # [B,C,K,h8]
    cols = jnp.take(cx, x_, axis=0)                  # [B,C,K,w8]
    score = jnp.einsum("bcki,bijc,bckj->bck", rows, x, cols, precision=hi)
    score = jnp.where(valid, score, 0.0)
    xy = jnp.stack([x_, y], axis=-1).astype(jnp.int32)
    count = valid.sum(axis=2).astype(jnp.int32)
    return Peaks(xy=xy, score=score, valid=valid, count=count)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def find_peaks(heatmap: jax.Array, thre1: float, k: int = 32,
               sigma: float = 3.0, two_stage: bool = False,
               select: Optional[str] = None) -> Peaks:
    """heatmap: [H,W,C] averaged (unblurred) heatmaps -> Peaks over C channels.

    The caller passes only the joint channels (reference drops the background
    channel: ``range(njoint-1)``, src/body.py:86).
    """
    h, w, c = heatmap.shape
    blurred = gaussian_blur(heatmap, sigma)
    mask = _nms_mask(blurred, thre1)                      # [H,W,C]

    del two_stage
    # K smallest masked flat indices (row-major order, np.nonzero semantics);
    # invalid slots get index h*w (sentinel).
    idx = _select_peaks(mask, k, select)                  # [C,K] ascending
    valid = idx < h * w
    idx = jnp.where(valid, idx, 0)
    y = idx // w
    x = idx % w
    flat_scores = heatmap.transpose(2, 0, 1).reshape(c, h * w)
    score = jnp.take_along_axis(flat_scores, idx, axis=1)
    score = jnp.where(valid, score, 0.0)
    xy = jnp.stack([x, y], axis=-1).astype(jnp.int32)
    count = valid.sum(axis=1).astype(jnp.int32)
    return Peaks(xy=xy, score=score, valid=valid, count=count)
