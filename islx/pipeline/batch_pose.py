"""Batched frame pipelines — the throughput path.

The reference processes one frame at a time with host<->device round trips per
scale (demo_video.py:121-140 outer loop; SURVEY.md §3.2). Here frames are
resized into a fixed stride-aligned bucket and a whole batch flows through one
jitted program: normalize -> CPM forward -> x8 upsample -> blur/NMS peaks ->
PAF pair scoring, all on device; only the tiny greedy grouping runs on host
per frame.

Production-vs-parity: peaks are extracted at bucket resolution and coordinates
scaled back to the source frame (<=1px from the reference's
resize-to-original-then-NMS order); the reference-exact path lives in
islx.pose.body.Body. Hand crops are resized to one fixed square bucket so the
hand CPM runs as a single batched call over all detected hands; the scale
pyramid is configurable (reference-compat 4 scales or a fast single scale).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from islx.core.config import HandConfig, PoseConfig
from islx.models import cpm
from islx.ops import grouping
from islx.ops.hand_peaks import (find_hand_peaks, find_hand_peaks_fast,
                                 find_hand_peaks_refine)
from islx.ops.paf import (LIMB_TABLES, compact_connections, score_limbs,
                          score_limbs_cell, score_limbs_fused,
                          score_limbs_mxu)
from islx.ops.peaks import (find_peaks, find_peaks_fused,
                            find_peaks_fused_batched)
from islx.ops.preprocess import pad_amounts
from islx.ops.resize import dynamic_crop_resize_batch, resize_cubic


def _device_resident(params: cpm.Params, mesh=None) -> cpm.Params:
    """Pin a param tree to device memory at pipeline construction.

    Numpy-leaved trees (e.g. host-side quantized checkpoints, raw np.load
    results) would otherwise be re-uploaded host->device on EVERY
    device_step dispatch — on the relay-degraded link that is ~1-2s of
    weight traffic per step and was measured as a 16x fps collapse of the
    int8 config (BENCH_NOTES.md round 3). With a mesh the params are placed
    replicated (matching the fused program's in_shardings); device_put is a
    cheap no-op for leaves already resident on the right devices."""
    if mesh is not None:
        from islx.parallel import mesh as M

        return jax.device_put(params, M.replicated(mesh))
    dev = jax.config.jax_default_device
    if dev is None:
        dev = jax.local_devices()[0]
    return jax.device_put(params, dev)


def _chunked_vmap(fn, args: tuple, chunk: Optional[int]):
    """vmap fn over the leading axis, in lax.map chunks of ``chunk``.

    Compile-time control: a flat N-way vmap of dynamic-slice/gather-heavy
    bodies makes the TPU backend optimize one enormous fused graph (the
    round-1 B>=64 hand-program compile blowup); chunking compiles the body
    once for ``chunk`` lanes and scans it N/chunk times. chunk=None or
    non-dividing N falls back to the flat vmap.
    """
    n = args[0].shape[0]
    if not chunk or n <= chunk or n % chunk:
        return jax.vmap(fn)(*args)
    resh = tuple(a.reshape((n // chunk, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(lambda xs: jax.vmap(fn)(*xs), resh)
    return jax.tree_util.tree_map(
        lambda o: o.reshape((n,) + o.shape[2:]), out)


def bucket_for(h: int, w: int, target_h: int = 184, stride: int = 8
               ) -> Tuple[int, int]:
    """Stride-aligned bucket: scale height to target, round width up."""
    scale = target_h / h
    wb = int(np.ceil(w * scale / stride) * stride)
    return target_h, wb


def detect_hand_boxes(results, hb: int, wb: int, orig_hw: Tuple[int, int],
                      max_hands: int) -> np.ndarray:
    """Per-frame (candidate, subset) in bucket coords -> fixed-count hand
    boxes [len(results)*max_hands, 4] = (frame_idx, x0, y0, w) in BUCKET
    coords (w<=0 pads). Detection geometry runs in original-image coords
    (the reference's 20px minimum, src/util.py:298, is an original-pixels
    rule)."""
    from islx.pose.detector import hand_detect

    h0, w0 = orig_hw
    sy, sx = h0 / hb, w0 / wb
    boxes = np.zeros((len(results) * max_hands, 4), np.int32)
    for fidx, (cand, subset) in enumerate(results):
        if cand.shape[0] == 0:
            continue
        cand_orig = cand.copy()
        cand_orig[:, 0] *= sx
        cand_orig[:, 1] *= sy
        dets = hand_detect(cand_orig, subset, (h0, w0))
        for slot, (x, y, w, _left) in enumerate(dets[:max_hands]):
            bx = min(int(round(x / sx)), wb - 1)
            by = min(int(round(y / sy)), hb - 1)
            bw = max(min(int(round(w / sx)), wb - bx, hb - by), 1)
            boxes[fidx * max_hands + slot] = (fidx, bx, by, bw)
    return boxes


def _pack2x16(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Two int arrays in [0, 65536) -> one s32 word each (lo | hi<<16)."""
    return jnp.bitwise_or(jnp.bitwise_and(lo.astype(jnp.int32), 0xFFFF),
                          jnp.left_shift(hi.astype(jnp.int32), 16))


def _pack4x8(p: jax.Array) -> jax.Array:
    """[..., 4] ints in [0, 256) -> s32 words (little-endian byte order,
    matching numpy .view(np.uint8) on the fetched buffer)."""
    p = p.astype(jnp.int32)
    return (p[..., 0] | (p[..., 1] << 8) | (p[..., 2] << 16)
            | (p[..., 3] << 24))


def _packf16x2(x: jax.Array) -> jax.Array:
    """f32 [..., 2n] -> s32 words [..., n], two IEEE f16 per word
    (round-to-nearest; lo half first, matching the host unpack)."""
    assert x.shape[-1] % 2 == 0, x.shape
    h = jax.lax.bitcast_convert_type(
        x.astype(jnp.float16).reshape(x.shape[:-1] + (x.shape[-1] // 2, 2)),
        jnp.uint16).astype(jnp.int32)
    return h[..., 0] | (h[..., 1] << 16)


def _unpackf16x2(w: np.ndarray) -> np.ndarray:
    """Host inverse of _packf16x2 on a flat word array -> flat f32."""
    u = np.ascontiguousarray(w).view(np.uint32)
    lo = (u & 0xFFFF).astype(np.uint16).view(np.float16)
    hi = (u >> 16).astype(np.uint16).view(np.float16)
    return np.stack([lo, hi], -1).reshape(-1).astype(np.float32)


def _pack_body(pk, cc, mode: str = "nook") -> jax.Array:
    """Pack the peak + connection tables into ONE flat buffer: each
    separate device->host fetch pays a fixed RPC round trip on tunneled TPU
    runtimes, so every program returns a single (small) download.

    mode 'nook': the ok plane is folded into the score as a -1e30
    sentinel (host recovers ok = score > -1e30) — the pred linearization
    fusion was ~2.7ms/step on the B=192 body program for a bit that is
    derivable. 'flat' ships all six planes (kept for A/B).

    mode 'bits' (default): nook folding + integer planes bit-packed into ONE
    s32 buffer — xy as two s16 per word, pair indices (pair = i*K+j < K*K)
    as four u8 per word when K*K <= 256 else two s16 per word, f32 score
    planes bitcast. Bit-exact (integers and raw f32 bits; no NaN patterns
    are ever formed since coords < 2^15) at ~62% of the nook bytes: the
    fetch leg rides the same degraded link as the uploads (CLAUDE.md), so
    result bytes are throughput.

    mode 'bits16': like 'bits' but the two f32 score planes (66% of the
    bits words) ship as two IEEE f16 per word — ~65% of the bits bytes.
    NOT bit-exact: scores round to ~5e-4 relative, below the production
    bf16 compute path's own divergence (PARITY.md). The non-ok cscore
    sentinel becomes -inf (f16-representable); ok scores are > 0 by
    crit2, so no live value can collide with it."""
    if mode in ("bits", "bits16"):
        k = pk.xy.shape[-2]
        m = cc.pair.shape[-1]
        if k * k <= 256:                       # pair fits a byte
            assert m % 4 == 0, (k, m)
            pair = _pack4x8(cc.pair.reshape(cc.pair.shape[:-1] + (m // 4, 4)))
        else:                                  # pair < K*K <= 2^15: s16 pairs
            assert k * k <= 1 << 15 and m % 2 == 0, (k, m)
            p2 = cc.pair.reshape(cc.pair.shape[:-1] + (m // 2, 2))
            pair = _pack2x16(p2[..., 0], p2[..., 1])
        if mode == "bits16":
            assert k % 2 == 0
            return jnp.concatenate([
                _pack2x16(pk.xy[..., 0], pk.xy[..., 1]).reshape(-1),
                _packf16x2(pk.score).reshape(-1),
                pk.count.astype(jnp.int32).reshape(-1),
                pair.reshape(-1),
                _packf16x2(jnp.where(cc.ok, cc.score, -jnp.inf)).reshape(-1),
            ])
        parts = [
            _pack2x16(pk.xy[..., 0], pk.xy[..., 1]).reshape(-1),
            jax.lax.bitcast_convert_type(pk.score, jnp.int32).reshape(-1),
            pk.count.astype(jnp.int32).reshape(-1),
            pair.reshape(-1),
            jax.lax.bitcast_convert_type(
                jnp.where(cc.ok, cc.score, -1e30), jnp.int32).reshape(-1),
        ]
        return jnp.concatenate(parts)
    parts = [
        pk.xy.astype(jnp.float32).reshape(-1),
        pk.score.reshape(-1),
        pk.count.astype(jnp.float32).reshape(-1),
        cc.pair.astype(jnp.float32).reshape(-1),
    ]
    if mode == "nook":
        parts.append(jnp.where(cc.ok, cc.score, -1e30).reshape(-1))
    else:
        parts += [cc.score.reshape(-1),
                  cc.ok.astype(jnp.float32).reshape(-1)]
    return jnp.concatenate(parts)


def _pair_words(k: int, m: int) -> int:
    """Words per limb row of the packed pair plane (u8x4 or s16x2)."""
    return m // 4 if k * k <= 256 else m // 2


def _body_pack_len(b: int, c: int, k: int, l: int, m: int,
                   mode: str = "nook") -> int:
    if mode == "bits16":
        return b * (c * k + c * (k // 2) + c + l * _pair_words(k, m)
                    + l * (m // 2))
    if mode == "bits":
        return b * (c * k * 2 + c + l * _pair_words(k, m) + l * m)
    return b * (c * k * 3 + c + (2 if mode == "nook" else 3) * l * m)


class BatchedBodyPipeline:
    """Fixed-bucket batched body pose: u8 frames -> (candidate, subset) list."""

    def __init__(self, params: cpm.Params, model_type: str = "body25",
                 cfg: Optional[PoseConfig] = None,
                 compute_dtype=jnp.bfloat16, mesh=None, top_m: int = 48,
                 paf_mode: str = "cell8", two_stage_peaks: bool = True,
                 fused_peaks: Optional[bool] = None,
                 pallas_nms: Optional[bool] = None,
                 pallas_mask: Optional[bool] = None):
        # weights pre-cast to the compute dtype: the per-step f32->bf16
        # convert inside the program is pure HBM traffic (see cpm.cast_params)
        self.params = _device_resident(
            cpm.cast_params(params, compute_dtype), mesh)
        self.model_type = model_type
        self.cfg = cfg or PoseConfig(model_type=model_type)
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.top_m = top_m    # device-sorted connection candidates per limb
        # /8-grid PAF scoring variants (tools/tpu_validate.py pafmode):
        # 'cell8' (per-cell count matrix in int8 — counts <= mid_num, 1/4
        # the HBM bytes of s32; DEFAULT, 62.7 vs 66.6 ms/step at B=192) |
        # 'cell' (s32 counts) | 'vcell8' (int8 + vmapped limbs; measured
        # slower, 69.3) | 'fused' (materialization-free compare-reduce) |
        # 'take' (small-table gather) | 'mxu' (one-hot matmul) | 'exact'
        # (full-res parity).
        # All /8 modes produce identical crit1/ok booleans; swdp differs
        # only by f32 summation order (tests/test_batch_pipeline.py).
        self.paf_mode = paf_mode
        self.two_stage_peaks = two_stage_peaks
        # fused_peaks: blur folded into the x8 upsample + peak-score
        # reconstruction (ops.peaks.find_peaks_fused) — the production
        # default; the exact-parity construction (paf_mode='exact',
        # two_stage_peaks=False) keeps the reference op order.
        if fused_peaks is None:
            fused_peaks = two_stage_peaks
        self.fused_peaks = fused_peaks
        # pallas_nms: NMS+first-K peak selection as one Pallas VMEM pass
        # (islx.ops.pallas_peaks) instead of the XLA rank/cumsum chain.
        # TPU-validated bit-exact (tools/tpu_validate.py nmspeaks) but
        # MEASURED SLOWER than the XLA epilogue (225-238 vs 190-210 ms/64-
        # frame body step, interleaved): the K sequential VMEM min-extracts
        # cost more than the HBM rank tensor they avoid. Stays opt-in via
        # ISLX_PALLAS_NMS as a validated alternate (docs/PERFORMANCE.md).
        if pallas_nms is None:
            env = os.environ.get("ISLX_PALLAS_NMS")
            pallas_nms = env is not None and env not in ("0", "false")
        # pallas_call does not auto-partition under pjit — keep the XLA
        # selection when the program is sharded over a mesh
        self.pallas_nms = (bool(pallas_nms) and self.fused_peaks
                           and mesh is None)
        # pallas_mask: ONLY the NMS mask + row counts as a Pallas VMEM pass
        # (islx.ops.pallas_peaks.nms_mask_rows), selection stays the XLA
        # row-blocked chain. The XLA epilogue re-reads the blurred maps ~5x
        # from HBM (two f32 reduce-window pools + mask + row counts); the
        # kernel reads them once. TPU default — measured 66.6 vs 70.1
        # ms/step on the B=192 body program with assembled-output equality
        # (tools/tpu_validate.py nmsmask); ISLX_PALLAS_MASK=0 disables.
        if pallas_mask is None:
            env = os.environ.get("ISLX_PALLAS_MASK")
            if env is None:
                pallas_mask = jax.default_backend() == "tpu"
            else:
                pallas_mask = env not in ("0", "false")
        self.pallas_mask = (bool(pallas_mask) and self.fused_peaks
                            and mesh is None and not self.pallas_nms)
        # first-K peak selection variant: "rows" (row-blocked two-level,
        # default) | "flat" (full rank/cumsum chain). Resolved HERE so the
        # mode is a static arg in this pipeline's programs (an env read
        # inside find_peaks_fused's own jit cache would be ignored on reuse).
        self.peaks_select = os.environ.get("ISLX_PEAKS_SELECT", "rows")
        # result-buffer packing (A/B via ISLX_PACK_MODE):
        #   'bits16' (production default) — integer planes bit-packed into
        #     one s32 buffer + score planes as two f16 per word + hand-found
        #     bitmask: 1541 words/frame vs bits 2357 / nook 3663
        #     (tools/tpu_validate.py packab; PARITY.md #9). Scores round
        #     ~5e-4 relative — NOT bit-exact.
        #   'bits' (default for the parity construction paf_mode='exact',
        #     which must stay bit-for-bit — CLAUDE.md) — same integer
        #     packing, f32 score planes bitcast; bit-exact.
        #   'nook' (f32, ok folded into a score sentinel) | 'flat' (all six
        #     planes) — kept for A/B.
        self.pack_mode = os.environ.get(
            "ISLX_PACK_MODE", "bits" if paf_mode == "exact" else "bits16")
        self.limb_seq, self.map_idx = LIMB_TABLES[model_type]
        self._programs = {}

    def _core_fn(self, hb: int, wb: int):
        """Body core: frames [B,hb,wb,3] u8-valued -> (pk, cc) device tables
        (vmapped Peaks + CompactConnections, any leading batch). Shared by
        the standalone body program and FusedPosePipeline."""
        cfg = self.cfg
        forward = cpm.FORWARDS[self.model_type]
        cd = self.compute_dtype
        limb_seq = jnp.asarray(self.limb_seq)
        map_idx = jnp.asarray(self.map_idx)

        def single_scale(params, frames, thre1):
            x = frames.astype(jnp.float32) / 256.0 - 0.5
            paf8, heat8 = forward(params, x, cd)
            if self.fused_peaks and (self.pallas_nms or self.pallas_mask):
                # blur ∘ upsample folded into one matmul pair + the NMS
                # epilogue (mask-only or mask+selection) as a Pallas VMEM pass
                pk = find_peaks_fused_batched(
                    heat8[:, :, :, :cfg.njoint - 1], hb, wb, thre1,
                    cfg.max_peaks,
                    kernel="mask" if self.pallas_mask else "select")
            elif self.fused_peaks:
                # blur ∘ upsample folded into one matmul pair; the
                # unblurred full-res heatmap is never materialized
                pk = jax.vmap(lambda h: find_peaks_fused(
                    h[:, :, :cfg.njoint - 1], hb, wb, thre1,
                    cfg.max_peaks,
                    two_stage=self.two_stage_peaks,
                    select=self.peaks_select))(heat8)
            else:
                heat = resize_cubic(heat8, hb, wb)   # x8, batched over B
                pk = jax.vmap(lambda h: find_peaks(
                    h[:, :, :cfg.njoint - 1], thre1, cfg.max_peaks,
                    two_stage=self.two_stage_peaks,
                    select=self.peaks_select))(heat)
            return pk, paf8

        def multi_scale(params, frames, thre1):
            """Scale pyramid at batch (reference src/body.py:41-81):
            each scale's upsample->de-pad->back-to-bucket chain is one
            folded matmul pair (ops.peaks._pyramid_axis_fold), so the
            pyramid average adds one small matmul per scale instead of
            materializing per-scale full-res maps."""
            from islx.ops.peaks import (_pyramid_axis_fold,
                                        find_peaks_pyramid)
            from islx.ops.resize import output_size

            n_s = len(cfg.scale_search)
            # heat averaging weights; the reference's buggy accumulator
            # (src/body.py:80 avg += avg + h/n) is the 2^(n-1-s)/n series
            # and only affects heatmaps, PAFs average correctly
            if cfg.ref_compat_averaging:
                w_heat = [2.0 ** (n_s - 1 - i) / n_s for i in range(n_s)]
            else:
                w_heat = [1.0 / n_s] * n_s
            heat8s, paf8s, folds, gfolds = [], [], [], []
            for s in cfg.scale_search:
                f = s * cfg.boxsize / hb
                hs, ws = output_size(hb, f), output_size(wb, f)
                x = (frames.astype(jnp.float32) if (hs, ws) == (hb, wb)
                     else resize_cubic(frames, hs, ws,
                                       saturate_uint8=True))
                pd, pr = pad_amounts(hs, ws, cfg.stride)
                x = jnp.pad(x, ((0, 0), (0, pd), (0, pr), (0, 0)),
                            constant_values=float(cfg.pad_value))
                x = x / 256.0 - 0.5
                paf8_s, heat8_s = forward(params, x, cd)
                heat8s.append(heat8_s)
                paf8s.append(paf8_s)
                h8p, w8p = (hs + pd) // cfg.stride, (ws + pr) // cfg.stride
                fhb = _pyramid_axis_fold(hb, hs, h8p, cfg.stride, 3.0)
                fwb = _pyramid_axis_fold(wb, ws, w8p, cfg.stride, 3.0)
                fh = _pyramid_axis_fold(hb, hs, h8p, cfg.stride)
                fw = _pyramid_axis_fold(wb, ws, w8p, cfg.stride)
                folds.append(((jnp.asarray(fhb), jnp.asarray(fwb)),
                              (jnp.asarray(fh), jnp.asarray(fw))))
                # PAF sampled back onto the bucket /8 grid: rows of the
                # plain fold at full-res positions 0, stride, 2*stride...
                gfolds.append((jnp.asarray(fh[::cfg.stride]),
                               jnp.asarray(fw[::cfg.stride])))

            pk = jax.vmap(lambda *hs_: find_peaks_pyramid(
                [h[:, :, :cfg.njoint - 1] for h in hs_], folds, w_heat,
                thre1, cfg.max_peaks, self.two_stage_peaks,
                select=self.peaks_select))(*heat8s)
            hi = jax.lax.Precision.HIGHEST
            # averaged PAF, reconstructed on the bucket /8 grid (mxu
            # mode) or at full bucket resolution (exact mode)
            mats = gfolds if self.paf_mode != "exact" \
                else [f[1] for f in folds]
            paf_avg = None
            for p8, (gh, gw) in zip(paf8s, mats):
                p = jnp.einsum("oh,bhwc->bowc", gh,
                               p8.astype(jnp.float32), precision=hi)
                p = jnp.einsum("pw,bowc->bopc", gw, p,
                               precision=hi) / n_s
                paf_avg = p if paf_avg is None else paf_avg + p
            return pk, paf_avg

        def core(params, frames, thre1):
            multi = len(cfg.scale_search) > 1
            if multi:
                pk, paf_in = multi_scale(params, frames, thre1)
            else:
                pk, paf_in = single_scale(params, frames, thre1)
            at8 = {"mxu": score_limbs_mxu, "cell": score_limbs_cell,
                   "cell8": lambda *a, **kw: score_limbs_cell(
                       *a, count_dtype=jnp.int8, **kw),
                   "vcell8": lambda *a, **kw: score_limbs_cell(
                       *a, count_dtype=jnp.int8, seq=False, **kw),
                   "fused": score_limbs_fused,
                   "take": lambda *a, **kw: score_limbs_fused(
                       *a, impl="take", **kw)}
            if self.paf_mode in at8:
                fn = at8[self.paf_mode]
                ls_fn = lambda p8, xy, v: fn(  # noqa: E731
                    p8, xy, v, limb_seq, map_idx, cfg.stride, cfg.thre2,
                    cfg.mid_num, orig_h=jnp.float32(hb))
            else:
                if not multi:
                    paf_in = resize_cubic(paf_in, hb, wb)
                ls_fn = lambda p, xy, v: score_limbs(  # noqa: E731
                    p, xy, v, limb_seq, map_idx, cfg.thre2, cfg.mid_num,
                    orig_h=jnp.float32(hb))
            cc = jax.vmap(lambda p, xy, v: compact_connections(
                ls_fn(p, xy, v), self.top_m))(paf_in, pk.xy, pk.valid)
            return pk, cc

        return core

    def _program(self, b: int, hb: int, wb: int):
        key = (b, hb, wb)
        if key not in self._programs:
            core = self._core_fn(hb, wb)

            def program(params, frames_flat, thre1):
                # frames arrive as a flat u8 buffer: multi-dim u8 arrays pay a
                # massive tiled-layout conversion on host->device transfer
                # (measured ~25MB/s vs ~1.5GB/s flat); reshape on device.
                frames = frames_flat.reshape(b, hb, wb, 3)
                return _pack_body(*core(params, frames, thre1),
                                  self.pack_mode)

            if self.mesh is None:
                self._programs[key] = jax.jit(program)
            else:
                from islx.parallel import mesh as M

                self._programs[key] = jax.jit(
                    program,
                    in_shardings=(M.replicated(self.mesh),
                                  M.batch_sharding(self.mesh), None),
                    out_shardings=M.replicated(self.mesh))
        return self._programs[key]

    def upload_frames(self, frames: np.ndarray) -> jax.Array:
        """Upload a frame batch once as a flat u8 device buffer (reusable by
        the fused hand pipeline — one upload feeds both programs)."""
        return jnp.asarray(np.asarray(frames).reshape(-1))

    def device_step_flat(self, flat: jax.Array, b: int, hb: int, wb: int,
                         thre1: Optional[float] = None) -> jax.Array:
        t1 = jnp.float32(self.cfg.thre1 if thre1 is None else thre1)
        return self._program(b, hb, wb)(self.params, flat, t1)

    def device_step(self, frames: np.ndarray | jax.Array,
                    thre1: Optional[float] = None) -> jax.Array:
        """frames u8 [B,Hb,Wb,3] (bucketed) -> packed flat f32 result buffer.

        thre1 overrides the config peak threshold (traced, no recompile).
        """
        b, hb, wb = frames.shape[0], frames.shape[1], frames.shape[2]
        return self.device_step_flat(self.upload_frames(frames), b, hb, wb,
                                     thre1)

    def unpack(self, packed: np.ndarray, b: int):
        """Packed buffer -> (xy, score, count, pair, cscore, cok) numpy."""
        c = self.cfg.njoint - 1
        k = self.cfg.max_peaks
        l = self.limb_seq.shape[0]
        m = self.top_m
        if self.pack_mode in ("bits", "bits16"):
            half = self.pack_mode == "bits16"
            sizes = [b * c * k, b * c * (k // 2 if half else k), b * c,
                     b * l * _pair_words(k, m),
                     b * l * (m // 2 if half else m)]
            parts = np.split(np.ascontiguousarray(np.asarray(packed)),
                             np.cumsum(sizes)[:-1])
            w = parts[0].reshape(b, c, k)
            xy = np.stack([w & 0xFFFF, (w >> 16) & 0xFFFF], -1
                          ).astype(np.int32)
            if half:
                score = _unpackf16x2(parts[1]).reshape(b, c, k)
                cscore = _unpackf16x2(parts[4]).reshape(b, l, m)
                cok = cscore > -6e4   # sentinel is f16 -inf
            else:
                score = parts[1].view(np.float32).reshape(b, c, k)
                cscore = parts[4].view(np.float32).reshape(b, l, m)
                cok = cscore > -1e29
            count = parts[2].reshape(b, c).astype(np.int32)
            if k * k <= 256:
                pair = (parts[3].view(np.uint8).astype(np.int32)
                        .reshape(b, l, m))
            else:
                pair = (parts[3].view(np.uint16).astype(np.int32)
                        .reshape(b, l, m))
            return xy, score, count, pair, np.where(cok, cscore, 0.0), cok
        sizes = [b * c * k * 2, b * c * k, b * c, b * l * m, b * l * m]
        if self.pack_mode != "nook":
            sizes.append(b * l * m)
        parts = np.split(np.asarray(packed), np.cumsum(sizes)[:-1])
        xy = parts[0].reshape(b, c, k, 2).astype(np.int32)
        score = parts[1].reshape(b, c, k)
        count = parts[2].reshape(b, c).astype(np.int32)
        pair = parts[3].reshape(b, l, m).astype(np.int32)
        cscore = parts[4].reshape(b, l, m)
        if self.pack_mode == "nook":
            cok = cscore > -1e29
            cscore = np.where(cok, cscore, 0.0)
        else:
            cok = parts[5].reshape(b, l, m) > 0.5
        return xy, score, count, pair, cscore, cok

    def __call__(self, frames: np.ndarray,
                 orig_hw: Optional[Tuple[int, int]] = None,
                 thre1: Optional[float] = None
                 ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """frames u8 [B,Hb,Wb,3] -> per-frame (candidate, subset).

        orig_hw: source frame size; peak coordinates are scaled back to it.
        """
        b, hb, wb = frames.shape[:3]
        packed = self.device_step(frames, thre1)
        out = self.assemble(packed, b)
        if orig_hw is not None:
            sy, sx = orig_hw[0] / hb, orig_hw[1] / wb
            for cand, _ in out:
                if cand.shape[0]:
                    cand[:, 0] *= sx
                    cand[:, 1] *= sy
        return out

    def assemble(self, packed, b: int) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Packed device buffer -> per-frame (candidate, subset).

        Uses the native C++ grouping kernel when available (whole batch in one
        call), numpy fallback otherwise.
        """
        xy, score, count, pair, cscore, cok = self.unpack(packed, b)
        from islx.ops import native

        if native.available():
            return native.assemble_batch(
                xy, score, count, pair, cscore, cok, self.cfg.max_peaks,
                self.limb_seq, self.cfg.njoint)
        return [grouping.assemble_sorted(
            xy[i], score[i], count[i], pair[i], cscore[i], cok[i],
            self.cfg.max_peaks, self.limb_seq, self.cfg.njoint)
            for i in range(b)]


class BatchedHandPipeline:
    """Fixed-bucket batched hand pose: u8 crops [N,S,S,3] -> peaks [N,21,2]."""

    def __init__(self, params: cpm.Params, cfg: Optional[HandConfig] = None,
                 crop_size: int = 368, compute_dtype=jnp.bfloat16, mesh=None,
                 peak_mode: str = "cc", crop_chunk: Optional[int] = None):
        self.params = _device_resident(
            cpm.cast_params(params, compute_dtype), mesh)  # see body pipe
        self.cfg = cfg or HandConfig()
        self.crop_size = crop_size
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        # multi-scale peak extraction: 'cc' = the reference-exact connected-
        # component selection (src/hand.py:59-73) batched over crops; 'fast' =
        # global argmax (identical whenever the max lies in the best blob).
        # The single-scale production branch always uses coarse-to-fine argmax.
        self.peak_mode = peak_mode
        # optional lax.map chunk for the refine stage (see _chunked_vmap).
        # Since the refine became slice-free batched matmuls
        # (ops.hand_peaks.find_hand_peaks_refine) the flat vmap compiles
        # fast and runs identically — None (no chunking) is the default;
        # the knob remains as compile-time control for exotic shapes.
        self.crop_chunk = crop_chunk
        self._programs = {}

    def _program(self, n: int):
        if n not in self._programs:
            cfg = self.cfg
            s0 = self.crop_size
            cd = self.compute_dtype
            single_scale = len(cfg.scale_search) == 1

            def run_scale(params, crops, s):
                size = int(np.rint(s * cfg.boxsize))
                pd, pr = pad_amounts(size, size, cfg.stride)
                x = (crops if size == s0
                     else resize_cubic(crops, size, size, saturate_uint8=True))
                x = jnp.pad(x.astype(jnp.float32),
                            ((0, 0), (0, pd), (0, pr), (0, 0)),
                            constant_values=float(cfg.pad_value))
                x = x / 256.0 - 0.5
                heat = cpm.hand_forward(params, x, cd, cfg.stages)
                m = resize_cubic(heat, size + pd, size + pr)
                return m[:, :size, :size], size

            def pack(pk, scale):
                # single flat output buffer = single D2H round trip
                return jnp.concatenate([
                    pk.xy.astype(jnp.float32).reshape(-1),
                    pk.found.astype(jnp.float32).reshape(-1),
                    jnp.asarray([scale], jnp.float32)])

            def program(params, crops_flat):
                crops = crops_flat.reshape(n, s0, s0, 3)  # see body pipeline
                if single_scale:
                    # fast path: NO full-res heatmap upsample — coarse peak at
                    # net resolution + local-window cubic refinement
                    # (find_hand_peaks_refine), peaks in scale coords, host
                    # maps them back to crop coords (<=1px vs reference order)
                    s = cfg.scale_search[0]
                    size = int(np.rint(s * cfg.boxsize))
                    x = (crops if size == s0
                         else resize_cubic(crops, size, size,
                                           saturate_uint8=True))
                    x = x.astype(jnp.float32) / 256.0 - 0.5
                    heat = cpm.hand_forward(params, x, cd, cfg.stages)  # [n,size/8,.,22]
                    pk = jax.vmap(lambda h: find_hand_peaks_refine(
                        h[:, :, :cfg.n_parts], cfg.thre))(heat)
                    return pack(pk, s0 / size)
                heat_sum = jnp.zeros((n, s0, s0, 22), jnp.float32)
                for s in cfg.scale_search:
                    m, _ = run_scale(params, crops, s)
                    heat_sum = heat_sum + resize_cubic(m, s0, s0) / len(
                        cfg.scale_search)
                peak_fn = (find_hand_peaks if self.peak_mode == "cc"
                           else find_hand_peaks_fast)
                pk = jax.vmap(lambda h: peak_fn(
                    h[:, :, :cfg.n_parts], cfg.thre))(heat_sum)
                return pack(pk, 1.0)

            if self.mesh is None:
                self._programs[n] = jax.jit(program)
            else:
                from islx.parallel import mesh as M

                self._programs[n] = jax.jit(
                    program,
                    in_shardings=(M.replicated(self.mesh),
                                  M.batch_sharding(self.mesh)),
                    out_shardings=M.replicated(self.mesh))
        return self._programs[n]

    def __call__(self, crops: np.ndarray) -> np.ndarray:
        """crops u8 [N,S,S,3] (S = crop_size) -> peaks [N,21,2] in crop coords."""
        n = crops.shape[0]
        c = self.cfg.n_parts
        flat = jnp.asarray(np.asarray(crops).reshape(-1))
        packed = np.asarray(self._program(n)(self.params, flat))
        xy = packed[:n * c * 2].reshape(n, c, 2).astype(np.float64)
        found = packed[n * c * 2:n * c * 3].reshape(n, c) > 0.5
        coord_scale = float(packed[-1])
        xy *= coord_scale
        return np.where(found[:, :, None], np.rint(xy).astype(np.int32), 0)

    # ------------------------------------------------------------------
    # fused mode: crops cut on-device from already-resident frames
    # ------------------------------------------------------------------

    def _crops_core_fn(self):
        """Hand core: (params, frames [b,hb,wb,3], boxes [N,4]) -> (xy, valid)
        peaks in FRAME coords. Crops are cut and cubic-resized straight to
        the pyramid scale with on-device interpolation matrices
        (islx.ops.resize.dynamic_crop_resize_batch — one frame gather + two
        batched MXU matmuls), then CPM + coarse-to-fine peaks. Shared by the
        standalone frames-program and FusedPosePipeline."""
        cfg = self.cfg
        cd = self.compute_dtype
        assert len(cfg.scale_search) == 1, "fused mode is single-scale"
        size = int(np.rint(cfg.scale_search[0] * cfg.boxsize))

        def core(params, frames, boxes):
            # boxes: [N,4] i32 (frame_idx, x0, y0, w); w<=0 -> invalid
            crops = dynamic_crop_resize_batch(
                frames, boxes[:, 0], boxes[:, 1], boxes[:, 2],
                jnp.maximum(boxes[:, 3], 1), size)        # [N,size,size,3]
            x = crops / 256.0 - 0.5
            heat = cpm.hand_forward(params, x, cd, cfg.stages)  # one batch
            pk = _chunked_vmap(
                lambda h: find_hand_peaks_refine(
                    h[:, :, :cfg.n_parts], cfg.thre),
                (heat,), self.crop_chunk)
            # scale peaks from `size` coords back to frame coords
            scale = boxes[:, 3:4].astype(jnp.float32) / size
            xy = (pk.xy.astype(jnp.float32) * scale[:, :, None]
                  + boxes[:, None, 1:3].astype(jnp.float32))
            valid = (boxes[:, 3] > 0)[:, None] & pk.found
            return xy, valid

        return core

    def _frames_program(self, b: int, hb: int, wb: int, n: int):
        """Hand program taking resident frames + dynamic boxes: no crop
        upload at all (see _crops_core_fn); ONE packed result fetch."""
        key = ("frames", b, hb, wb, n)
        if key not in self._programs:
            core = self._crops_core_fn()

            def program(params, frames_flat, boxes):
                frames = frames_flat.reshape(b, hb, wb, 3)
                xy, valid = core(params, frames, boxes)
                return jnp.concatenate([
                    xy.reshape(-1), valid.astype(jnp.float32).reshape(-1)])

            self._programs[key] = jax.jit(program)
        return self._programs[key]

    def from_frames(self, frames_flat: jax.Array, b: int, hb: int, wb: int,
                    boxes: np.ndarray) -> np.ndarray:
        """frames_flat: device-resident flat u8 buffer of [b,hb,wb,3];
        boxes: [N,4] i32 (frame_idx, x0, y0, w) in frame coords, w<=0 pads.
        -> peaks [N,21,2] int32 in frame coords ((0,0) = missing)."""
        n = boxes.shape[0]
        c = self.cfg.n_parts
        packed = np.asarray(self._frames_program(b, hb, wb, n)(
            self.params, frames_flat, jnp.asarray(boxes, jnp.int32)))
        xy = packed[:n * c * 2].reshape(n, c, 2)
        found = packed[n * c * 2:].reshape(n, c) > 0.5
        return np.where(found[:, :, None], np.rint(xy).astype(np.int32), 0)


class FusedPosePipeline:
    """Body CPM + on-device hand-box placement + hand CPM in ONE program.

    The split pipelines above pay, per batch: one frame upload, a body-result
    fetch, a HOST round trip (greedy grouping -> detect_hand_boxes), a box
    upload and a hand fetch. On tunneled TPU runtimes every transfer carries a
    ~100ms fixed RPC cost, so those five legs — not device compute — bound
    throughput. Here hand boxes are derived ON DEVICE from the PAF connection
    tables (islx.ops.hand_boxes: best elbow->wrist chain per side, the
    reference's exact box geometry) and the hand CPM runs in the same jitted
    program: ONE u8 upload in, ONE bit-packed fetch out. Host grouping still
    produces the full skeletons from that same fetch — it now overlaps the
    next batch instead of gating the hand dispatch.

    Divergence vs the reference flow (src/util.py:242-306 boxes from grouped
    people): one box per arm side per frame, chained by best PAF score —
    identical for isolated people, may pick a different person's arm in
    overlapping multi-person scenes (PARITY.md).
    """

    def __init__(self, body_params: cpm.Params, hand_params: cpm.Params,
                 model_type: str = "body25",
                 pose_cfg: Optional[PoseConfig] = None,
                 hand_cfg: Optional[HandConfig] = None,
                 det_cfg=None,
                 compute_dtype=jnp.bfloat16, top_m: int = 48,
                 crop_chunk: Optional[int] = None, mesh=None):
        from islx.core.config import DetectorConfig

        self.body = BatchedBodyPipeline(
            body_params, model_type,
            pose_cfg or PoseConfig(model_type=model_type, max_peaks=16),
            compute_dtype=compute_dtype, top_m=top_m)
        self.hand = BatchedHandPipeline(
            hand_params, hand_cfg or HandConfig.production(),
            compute_dtype=compute_dtype, crop_chunk=crop_chunk)
        self.det_cfg = det_cfg or DetectorConfig()
        self.model_type = model_type
        # mesh: data-parallel frames over the `data` axis (params replicate).
        # The crop gather indexes arbitrary frames, so XLA inserts an
        # all-gather of the (small, u8) frame buffer along `data`; box slots
        # are frame-aligned (crop i -> frame i//2) so everything else stays
        # local to its shard.
        self.mesh = mesh
        if mesh is not None:  # re-pin replicated for the in_shardings below
            self.body.params = _device_resident(self.body.params, mesh)
            self.hand.params = _device_resident(self.hand.params, mesh)
            # the fused program is pjit-sharded over `data`; pallas_call
            # does not auto-partition under pjit
            self.body.pallas_nms = False
            self.body.pallas_mask = False
        self._programs = {}

    # hands per frame is fixed by construction: one per arm side
    MAX_HANDS = 2

    def _program(self, b: int, hb: int, wb: int, sy: float, sx: float,
                 fmt: str = "bgr"):
        from islx.ops.hand_boxes import device_hand_boxes

        key = (b, hb, wb, float(sy), float(sx), fmt)
        if key not in self._programs:
            body_core = self.body._core_fn(hb, wb)
            hand_core = self.hand._crops_core_fn()
            limb_seq = self.body.limb_seq
            det = self.det_cfg

            def program(bparams, hparams, frames_flat, thre1):
                if fmt == "yuv420":
                    # 1.5 bytes/px upload; BT.601 conversion on device
                    # (islx.ops.yuv) — a few VPU elementwise ops fused into
                    # the same program as the CPM convs
                    from islx.ops.yuv import yuv420_to_bgr

                    frames = yuv420_to_bgr(frames_flat, b, hb, wb)
                else:
                    frames = frames_flat.reshape(b, hb, wb, 3)
                pk, cc = body_core(bparams, frames, thre1)
                boxes2 = jax.vmap(lambda xy, p, s, o: device_hand_boxes(
                    xy, p, s, o, limb_seq, sy, sx, hb, wb, det))(
                    pk.xy, cc.pair, cc.score, cc.ok)      # [B,2,3]
                fidx = jax.lax.broadcasted_iota(
                    jnp.int32, (b, self.MAX_HANDS, 1), 0)
                boxes = jnp.concatenate([fidx, boxes2], -1
                                        ).reshape(b * self.MAX_HANDS, 4)
                hxy, hvalid = hand_core(hparams, frames, boxes)
                if self.body.pack_mode in ("bits", "bits16"):
                    # one s32 buffer end-to-end; hand coords rounded on
                    # device (bit-identical to the host rint they replace)
                    hw = _pack2x16(jnp.rint(hxy[..., 0]).astype(jnp.int32),
                                   jnp.rint(hxy[..., 1]).astype(jnp.int32))
                    if self.body.pack_mode == "bits16":
                        # 21 found-bits per hand in one word each
                        hv = jnp.sum(
                            hvalid.astype(jnp.int32)
                            << jnp.arange(hvalid.shape[-1], dtype=jnp.int32),
                            axis=-1)
                    else:
                        hv = hvalid.astype(jnp.int32)
                    return jnp.concatenate([
                        _pack_body(pk, cc, self.body.pack_mode),
                        boxes.reshape(-1),
                        hw.reshape(-1),
                        hv.reshape(-1)])
                return jnp.concatenate([
                    _pack_body(pk, cc, self.body.pack_mode),
                    boxes.astype(jnp.float32).reshape(-1),
                    hxy.reshape(-1),
                    hvalid.astype(jnp.float32).reshape(-1)])

            if self.mesh is None:
                self._programs[key] = jax.jit(program)
            else:
                from islx.parallel import mesh as M

                rep = M.replicated(self.mesh)
                self._programs[key] = jax.jit(
                    program,
                    in_shardings=(rep, rep, M.batch_sharding(self.mesh),
                                  None),
                    out_shardings=rep)
        return self._programs[key]

    def upload_frames(self, frames: np.ndarray) -> jax.Array:
        return self.body.upload_frames(frames)

    def drop_programs(self, hb: int, wb: int) -> None:
        """Evict every compiled program for bucket (hb, wb) — serving keeps
        per-resolution program caches bounded (islx.serve.MicroBatcher).

        Key shapes: fused (b, hb, wb, sy, sx, fmt); body (b, hb, wb);
        hand crop-programs are keyed by count (no bucket — kept) and
        frames-programs by ('frames', b, hb, wb, n)."""
        def bucket_of(key):
            if not isinstance(key, tuple):
                return None
            if key and key[0] == "frames":
                return key[2], key[3]
            if len(key) >= 3:
                return key[1], key[2]
            return None

        for cache in (self._programs, self.body._programs,
                      self.hand._programs):
            for key in [k for k in cache if bucket_of(k) == (hb, wb)]:
                del cache[key]

    def program_key(self, b: int, hb: int, wb: int,
                    orig_hw: Tuple[int, int],
                    input_format: str = "bgr") -> tuple:
        """The program-cache key a step with these shapes dispatches to
        (also the identity of an AOT artifact — islx.core.aot)."""
        return (b, hb, wb, float(orig_hw[0] / hb), float(orig_hw[1] / wb),
                input_format)

    def device_step_flat(self, flat: jax.Array, b: int, hb: int, wb: int,
                         orig_hw: Tuple[int, int],
                         thre1: Optional[float] = None,
                         input_format: str = "bgr") -> jax.Array:
        """input_format: 'bgr' (flat u8 [b*hb*wb*3]) or 'yuv420' (flat u8
        I420 planes, [b*hb*wb*3/2] — half the upload bytes)."""
        t1 = jnp.float32(self.body.cfg.thre1 if thre1 is None else thre1)
        return self._program(*self.program_key(b, hb, wb, orig_hw,
                                               input_format))(
            self.body.params, self.hand.params, flat, t1)

    def device_step(self, frames: np.ndarray,
                    orig_hw: Optional[Tuple[int, int]] = None,
                    thre1: Optional[float] = None) -> jax.Array:
        """frames u8 [B,Hb,Wb,3] -> packed flat f32 buffer (body tables +
        hand boxes + hand peaks). orig_hw defaults to the bucket itself."""
        b, hb, wb = frames.shape[0], frames.shape[1], frames.shape[2]
        return self.device_step_flat(self.upload_frames(frames), b, hb, wb,
                                     orig_hw or (hb, wb), thre1)

    def unpack(self, packed: np.ndarray, b: int):
        """-> (body_packed_view, boxes [B*2,4] i32, hand_peaks [B*2,21,2]
        i32 in BUCKET frame coords, (0,0) = missing)."""
        cfg = self.body.cfg
        c, k = cfg.njoint - 1, cfg.max_peaks
        l, m = self.body.limb_seq.shape[0], self.body.top_m
        nb = b * self.MAX_HANDS
        nh = self.hand.cfg.n_parts
        body_len = _body_pack_len(b, c, k, l, m, self.body.pack_mode)
        packed = np.asarray(packed)
        body_packed = packed[:body_len]
        rest = packed[body_len:]
        boxes = rest[:nb * 4].reshape(nb, 4).astype(np.int32)
        if self.body.pack_mode in ("bits", "bits16"):
            w = rest[nb * 4:nb * 4 + nb * nh].reshape(nb, nh)
            hxy_i = np.stack([w & 0xFFFF, (w >> 16) & 0xFFFF], -1
                             ).astype(np.int32)
            hv = rest[nb * 4 + nb * nh:]
            if self.body.pack_mode == "bits16":   # 21-bit masks, 1 word/hand
                hfound = ((hv.reshape(nb, 1) >> np.arange(nh)) & 1) > 0
            else:
                hfound = hv.reshape(nb, nh) > 0
            peaks = np.where(hfound[:, :, None], hxy_i, 0)
            return body_packed, boxes, peaks
        hxy = rest[nb * 4:nb * 4 + nb * nh * 2].reshape(nb, nh, 2)
        hfound = rest[nb * 4 + nb * nh * 2:].reshape(nb, nh) > 0.5
        peaks = np.where(hfound[:, :, None],
                         np.rint(hxy).astype(np.int32), 0)
        return body_packed, boxes, peaks

    def assemble(self, packed, b: int):
        """-> (per-frame (candidate, subset) list, boxes, hand peaks)."""
        body_packed, boxes, peaks = self.unpack(packed, b)
        return self.body.assemble(body_packed, b), boxes, peaks

    def hands_for_frame(self, boxes: np.ndarray, peaks: np.ndarray,
                        fidx: int, sy: float = 1.0, sx: float = 1.0):
        """Frame ``fidx``'s valid hand peaks as a list of [21,2] int64
        arrays scaled from bucket to original coords ((0,0) missing-part
        sentinels survive the multiply)."""
        out = []
        for slot in range(self.MAX_HANDS):
            j = fidx * self.MAX_HANDS + slot
            if boxes[j, 3] <= 0:
                continue
            pk = peaks[j].astype(np.float64)
            pk[:, 0] *= sx
            pk[:, 1] *= sy
            out.append(np.rint(pk).astype(np.int64))
        return out
