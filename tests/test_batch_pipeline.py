"""Batched production pipeline: compact-connection path must reproduce the
full-matrix grouping path exactly; the batched body pipeline must agree with
the reference-parity Body API at bucket resolution."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islx.core.config import PoseConfig
from islx.ops import grouping
from islx.ops.paf import LIMB_SEQ_BODY25, LimbScores, compact_connections


def _random_pose_tensors(rng, k=16, c=25):
    count = rng.randint(0, 5, size=c).astype(np.int32)
    xy = rng.randint(0, 100, size=(c, k, 2)).astype(np.int32)
    score = rng.rand(c, k).astype(np.float32)
    l = LIMB_SEQ_BODY25.shape[0]
    l_score = (rng.rand(l, k, k).astype(np.float32) - 0.3)
    valid = np.zeros((c, k), bool)
    for ch in range(c):
        valid[ch, :count[ch]] = True
    l_ok = rng.rand(l, k, k) > 0.6
    for li in range(l):
        a, b = LIMB_SEQ_BODY25[li]
        l_ok[li] &= valid[a][:, None] & valid[b][None, :]
    return xy, score, count, l_score, l_ok.astype(bool)


def test_compact_matches_full(rng):
    k = 16
    for _ in range(10):
        xy, score, count, l_score, l_ok = _random_pose_tensors(rng, k)
        cand_full, subset_full = grouping.assemble(
            xy, score, count, l_score, l_ok, LIMB_SEQ_BODY25, 26)

        cc = jax.jit(lambda s, o: compact_connections(
            LimbScores(jnp.asarray(s), jnp.asarray(o)), 48))(l_score, l_ok)
        cand_c, subset_c = grouping.assemble_sorted(
            xy, score, count, np.asarray(cc.pair), np.asarray(cc.score),
            np.asarray(cc.ok), k, LIMB_SEQ_BODY25, 26)

        np.testing.assert_array_equal(cand_full, cand_c)
        np.testing.assert_array_equal(subset_full, subset_c)


def test_paf_mxu_matches_exact_on_constant_channels(rng):
    """The gather-free MXU PAF scorer equals the exact sampler whenever each
    PAF channel is constant (cubic upsampling of a constant is constant, so
    /8 sampling loses nothing)."""
    import jax.numpy as jnp

    from islx.ops import paf as P

    h8, w8 = 12, 8
    stride = 8
    vals = (rng.rand(52) - 0.4).astype(np.float32)
    paf8 = np.broadcast_to(vals, (h8, w8, 52)).copy()
    paf_full = np.broadcast_to(vals, (h8 * stride, w8 * stride, 52)).copy()

    c, k = 25, 8
    count = rng.randint(1, 5, c)
    xy = np.zeros((c, k, 2), np.int32)
    valid = np.zeros((c, k), bool)
    for ch in range(c):
        xy[ch, :count[ch], 0] = rng.randint(0, w8 * stride, count[ch])
        xy[ch, :count[ch], 1] = rng.randint(0, h8 * stride, count[ch])
        valid[ch, :count[ch]] = True

    exact = P.score_limbs(jnp.asarray(paf_full), jnp.asarray(xy),
                          jnp.asarray(valid), jnp.asarray(P.LIMB_SEQ_BODY25),
                          jnp.asarray(P.MAP_IDX_BODY25), 0.05, 10,
                          orig_h=float(h8 * stride))
    mxu = P.score_limbs_mxu(jnp.asarray(paf8), jnp.asarray(xy),
                            jnp.asarray(valid), jnp.asarray(P.LIMB_SEQ_BODY25),
                            jnp.asarray(P.MAP_IDX_BODY25), stride, 0.05, 10,
                            orig_h=float(h8 * stride))
    np.testing.assert_allclose(np.asarray(exact.score), np.asarray(mxu.score),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(exact.ok), np.asarray(mxu.ok))

    # the per-cell regrouping samples identical /8 cells: crit1 is exactly
    # the mxu count and swdp differs only by f32 summation order
    cell = P.score_limbs_cell(jnp.asarray(paf8), jnp.asarray(xy),
                              jnp.asarray(valid),
                              jnp.asarray(P.LIMB_SEQ_BODY25),
                              jnp.asarray(P.MAP_IDX_BODY25), stride, 0.05, 10,
                              orig_h=float(h8 * stride))
    np.testing.assert_allclose(np.asarray(cell.score), np.asarray(mxu.score),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cell.ok), np.asarray(mxu.ok))


def test_paf_fused_matches_mxu_on_random_maps(rng):
    """The materialization-free scorers (fused reduce + small-table take)
    recover exactly the mxu one-hot sampled values on ARBITRARY /8 maps:
    identical ok booleans, scores equal to f32 summation order."""
    import jax.numpy as jnp

    from islx.ops import paf as P

    h8, w8 = 23, 16
    stride = 8
    paf8 = (rng.rand(h8, w8, 52).astype(np.float32) - 0.5)
    c, k = 25, 8
    xy = np.stack([rng.randint(0, w8 * stride, (c, k)),
                   rng.randint(0, h8 * stride, (c, k))], -1).astype(np.int32)
    valid = rng.rand(c, k) > 0.4
    args = (jnp.asarray(paf8), jnp.asarray(xy), jnp.asarray(valid),
            jnp.asarray(P.LIMB_SEQ_BODY25), jnp.asarray(P.MAP_IDX_BODY25),
            stride, 0.05, 10)
    mxu = P.score_limbs_mxu(*args, orig_h=float(h8 * stride))
    for impl in ("reduce", "take"):
        got = P.score_limbs_fused(*args, orig_h=float(h8 * stride), impl=impl)
        np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(mxu.ok))
        np.testing.assert_allclose(np.asarray(got.score),
                                   np.asarray(mxu.score), atol=1e-6)

    # the int8-count / vmapped-limb / chunked per-cell variants carry the
    # same integers (counts <= mid_num fit int8): identical ok booleans,
    # scores equal up to f32 summation order (XLA fuses reductions
    # differently across the variants)
    import os

    cell = P.score_limbs_cell(*args, orig_h=float(h8 * stride))
    try:
        for chunk, kw in ((None, dict(count_dtype=jnp.int8)),
                          (None, dict(count_dtype=jnp.int8, seq=False)),
                          ("4", dict(count_dtype=jnp.int8)),
                          ("8", dict(count_dtype=jnp.int8))):
            if chunk is not None:
                os.environ["ISLX_PAF_CHUNK"] = chunk
            got = P.score_limbs_cell(*args, orig_h=float(h8 * stride), **kw)
            np.testing.assert_array_equal(np.asarray(got.ok),
                                          np.asarray(cell.ok))
            np.testing.assert_allclose(np.asarray(got.score),
                                       np.asarray(cell.score), atol=1e-6)
    finally:
        os.environ.pop("ISLX_PAF_CHUNK", None)


def test_batched_hand_multiscale_averaging(rng):
    """The 4-scale batched hand branch averages per-scale heatmaps with the
    CORRECT mean (reference src/hand.py:56) before peak extraction."""
    import islx.pipeline.batch_pose as bp
    from islx.core.config import HandConfig
    from islx.pipeline.batch_pose import BatchedHandPipeline

    s0 = 46  # tiny crop bucket; scales 0.5/1.0 -> inputs 184, 368
    peak_by_size = {184: (5, 7), 368: (30, 20)}  # (y8, x8) per scale

    def hand_fwd(params, x, compute_dtype=None, stages=6):
        b, size = x.shape[0], x.shape[1]
        hh = size // 8
        m = np.zeros((hh, hh, 22), np.float32)
        y8, x8 = peak_by_size[size]
        m[y8, x8, :21] = 8.0 if size == 184 else 3.0  # survive the s=3 blur
        return jnp.broadcast_to(jnp.asarray(m), (b, hh, hh, 22))

    orig = bp.cpm.hand_forward
    bp.cpm.hand_forward = hand_fwd
    try:
        hand = BatchedHandPipeline(
            {}, HandConfig(scale_search=(0.5, 1.0)), crop_size=s0,
            compute_dtype=jnp.float32)
        crops = (rng.rand(2, s0, s0, 3) * 255).astype(np.uint8)
        peaks = hand(crops)
    finally:
        bp.cpm.hand_forward = orig
    # scale-0.5 peak has amplitude 1.0 vs 0.4: after the (correct) mean the
    # 0.5-scale blob dominates. Its /8 cell (5,7) at input 184 maps to crop
    # coords ~ (7*8+4)*(46/184), (5*8+4)*(46/184) = (15, 11).
    for n in range(2):
        x, y = peaks[n, 0]
        assert abs(x - 15) <= 2 and abs(y - 11) <= 2, peaks[n, 0]


def test_batched_hand_cc_matches_parity_api(rng):
    """Batched 4-scale hand mode with CC peak selection == Hand() parity API
    on the same stubbed net outputs (reference src/hand.py:35-73 at batch).

    The stub emits TWO blobs per part: a wide one (larger total score) and a
    taller single-cell one (global max) — connected-component selection must
    pick the wide blob (src/hand.py:68), so this also distinguishes the exact
    path from the fast global-argmax mode.
    """
    import islx.pipeline.batch_pose as bp
    from islx.core.config import HandConfig
    from islx.pipeline.batch_pose import BatchedHandPipeline
    from islx.pose.hand import Hand

    s0 = 46

    def hand_fwd(params, x, compute_dtype=None, stages=6):
        b, hh = x.shape[0], x.shape[1] // 8
        m = np.zeros((hh, hh, 22), np.float32)
        q = hh // 4
        # wide blob: 3x3 cells of 4.0 (total 36); tall blob: 2x2 of 8.0
        # (total 32 < 36 but max 8 > 4) — CC must pick the wide blob, global
        # argmax the tall one. Amplitudes sized to survive the sigma-3 blur.
        m[q:q + 3, q:q + 3, :21] = 4.0
        m[3 * q:3 * q + 2, 3 * q:3 * q + 2, :21] = 8.0
        return jnp.broadcast_to(jnp.asarray(m), (b, hh, hh, 22))

    cfg = HandConfig(scale_search=(0.5, 1.0, 1.5, 2.0))
    hand_ref = Hand(weights={}, config=cfg, forward_fn=hand_fwd)
    crops = (rng.rand(3, s0, s0, 3) * 255).astype(np.uint8)
    ref_peaks = np.stack([hand_ref(c) for c in crops])

    orig = bp.cpm.hand_forward
    bp.cpm.hand_forward = hand_fwd
    try:
        batched_cc = BatchedHandPipeline({}, cfg, crop_size=s0,
                                         compute_dtype=jnp.float32)(crops)
        batched_fast = BatchedHandPipeline({}, cfg, crop_size=s0,
                                           compute_dtype=jnp.float32,
                                           peak_mode="fast")(crops)
    finally:
        bp.cpm.hand_forward = orig

    np.testing.assert_array_equal(batched_cc, ref_peaks)
    # the discriminator: fast mode lands on the tall blob, CC on the wide one
    assert not np.array_equal(batched_fast, ref_peaks)


def test_batched_body_matches_parity_api(rng):
    """BatchedBodyPipeline on a bucket-sized frame == Body() on the same frame
    (same stubbed net outputs, orig == bucket so no coordinate scaling)."""
    from islx.pipeline.batch_pose import BatchedBodyPipeline
    from islx.pose.body import Body

    hb, wb = 96, 64
    heat = rng.rand(12, 8, 26).astype(np.float32) * 0.8
    paf = (rng.rand(12, 8, 52).astype(np.float32) - 0.5)

    def stub(params, x, compute_dtype=None):
        b = x.shape[0]
        return (jnp.broadcast_to(jnp.asarray(paf), (b, 12, 8, 52)),
                jnp.broadcast_to(jnp.asarray(heat), (b, 12, 8, 26)))

    frame = (rng.rand(hb, wb, 3) * 255).astype(np.uint8)

    # parity API path works on the raw frame; its scale-0.5 resize would
    # change the input, so compare via a config with scale chosen so the
    # net input == the frame (boxsize = 2*hb makes scale 1.0).
    cfg = PoseConfig(model_type="body25", scale_search=(0.5,), boxsize=2 * hb,
                     max_peaks=16)
    body = Body(weights={}, model_type="body25", config=cfg, forward_fn=stub)
    cand_ref, subset_ref = body(frame)

    pipe = BatchedBodyPipeline({}, "body25", cfg, compute_dtype=jnp.float32,
                               paf_mode="exact", two_stage_peaks=False)
    pipe_forward = stub
    import islx.pipeline.batch_pose as bp

    # inject the stub into the pipeline's forward table
    orig = bp.cpm.FORWARDS["body25"]
    bp.cpm.FORWARDS["body25"] = stub
    try:
        out = pipe(np.stack([frame, frame]), orig_hw=None)
    finally:
        bp.cpm.FORWARDS["body25"] = orig

    for cand, subset in out:
        np.testing.assert_allclose(cand, cand_ref, atol=1e-5)
        np.testing.assert_allclose(subset, subset_ref, atol=1e-5)


def test_body_empty_image(rng):
    """No peaks above threshold -> empty candidate/subset (no crashes)."""
    import jax.numpy as jnp

    from islx.pose.body import Body

    def stub_forward(params, x, compute_dtype=None):
        b = x.shape[0]
        return (jnp.zeros((b, 23, 30, 52)), jnp.zeros((b, 23, 30, 26)))

    body = Body(weights={}, model_type="body25", forward_fn=stub_forward)
    ori = (rng.rand(92, 120, 3) * 255).astype(np.uint8)
    candidate, subset = body(ori)
    assert candidate.shape == (0, 4)
    assert subset.shape == (0, 27)


def test_hand_empty_heatmap(rng):
    """All channels below threshold -> 21 x (0,0) sentinels (src/hand.py:64)."""
    import jax.numpy as jnp

    from islx.core.config import HandConfig
    from islx.pose.hand import Hand

    def stub_forward(params, x, compute_dtype=None):
        b, hh, wh = x.shape[0], x.shape[1] // 8, x.shape[2] // 8
        return jnp.zeros((b, hh, wh, 22))

    hand = Hand(weights={}, config=HandConfig(scale_search=(1.0,)),
                forward_fn=stub_forward)
    crop = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    peaks = hand(crop)
    np.testing.assert_array_equal(peaks, np.zeros((21, 2), np.int32))


def test_hand_crop_chunking_bitwise_equal(rng):
    """lax.map-chunked crop extraction/refine (compile-time control for the
    fused hand program) is bitwise-identical to the flat vmap."""
    from islx.core.config import HandConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import BatchedHandPipeline

    B, hb, wb, n = 4, 96, 128, 8
    params = cpm.init_params("hand")
    frames = (rng.rand(B, hb, wb, 3) * 255).astype(np.uint8)
    flat = jnp.asarray(frames.reshape(-1))
    boxes = np.stack([np.arange(n) % B, rng.randint(0, 60, n),
                      rng.randint(0, 40, n), np.full(n, 40)], 1).astype(np.int32)
    outs = []
    for chunk in (None, 4):
        hand = BatchedHandPipeline(params, HandConfig(scale_search=(0.5,)),
                                   compute_dtype=jnp.float32,
                                   crop_chunk=chunk)
        outs.append(hand.from_frames(flat, B, hb, wb, boxes))
    np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.parametrize("ref_compat", [False, True])
def test_batched_body_multiscale_matches_parity(rng, ref_compat):
    """Batched multi-scale body (per-scale folded matmul pyramid) == Body()
    parity API on the same stubbed net outputs (BASELINE config #2 family),
    for both correct averaging and the reference's buggy accumulator."""
    import islx.pipeline.batch_pose as bp
    from islx.pipeline.batch_pose import BatchedBodyPipeline
    from islx.pose.body import Body

    hb, wb = 48, 64
    # continuous blob fields sampled at each scale's /8 grid, so every path
    # sees the same underlying function
    rs = np.random.RandomState(3)
    heat_blobs = [(rs.uniform(0.1, 0.9), rs.uniform(0.1, 0.9),
                   rs.uniform(0.6, 1.2)) for _ in range(40)]
    paf_vals = (rs.rand(52) - 0.5).astype(np.float32)

    def render(h8, w8):
        yy, xx = np.mgrid[0:h8, 0:w8]
        yn, xn = (yy + 0.5) / h8, (xx + 0.5) / w8
        heat = np.zeros((h8, w8, 26), np.float32)
        for ch in range(25):
            cy, cx, a = heat_blobs[ch % len(heat_blobs)]
            cy, cx = (cy + 0.013 * ch) % 0.9, (cx + 0.029 * ch) % 0.9
            heat[:, :, ch] = a * np.exp(
                -((yn - cy) ** 2 + (xn - cx) ** 2) / (2 * 0.07 ** 2))
        paf = np.broadcast_to(paf_vals, (h8, w8, 52)).copy()
        return paf, heat

    def stub(params, x, compute_dtype=None):
        b, h8, w8 = x.shape[0], x.shape[1] // 8, x.shape[2] // 8
        paf, heat = render(h8, w8)
        return (jnp.broadcast_to(jnp.asarray(paf), (b, h8, w8, 52)),
                jnp.broadcast_to(jnp.asarray(heat), (b, h8, w8, 26)))

    cfg = PoseConfig(model_type="body25", scale_search=(0.5, 1.0),
                     boxsize=2 * hb, max_peaks=16,
                     ref_compat_averaging=ref_compat)
    frame = (rng.rand(hb, wb, 3) * 255).astype(np.uint8)
    body = Body(weights={}, model_type="body25", config=cfg, forward_fn=stub)
    cand_ref, subset_ref = body(frame)
    assert cand_ref.shape[0] > 0  # the stub must actually produce people

    orig = bp.cpm.FORWARDS["body25"]
    bp.cpm.FORWARDS["body25"] = stub
    try:
        pipe = BatchedBodyPipeline({}, "body25", cfg,
                                   compute_dtype=jnp.float32,
                                   paf_mode="exact", two_stage_peaks=False)
        out = pipe(np.stack([frame, frame]), orig_hw=None)
    finally:
        bp.cpm.FORWARDS["body25"] = orig

    for cand, subset in out:
        assert cand.shape == cand_ref.shape
        np.testing.assert_array_equal(cand[:, :2], cand_ref[:, :2])  # coords
        np.testing.assert_allclose(cand[:, 2], cand_ref[:, 2], atol=1e-4)
        assert subset.shape == subset_ref.shape
        np.testing.assert_array_equal(subset[:, :-2] >= 0,
                                      subset_ref[:, :-2] >= 0)
        np.testing.assert_allclose(subset[:, -2:], subset_ref[:, -2:],
                                   atol=1e-3)


def test_bits_pack_mode_matches_nook(rng, monkeypatch):
    """pack_mode='bits' (xy as two s16/word, pair as four u8/word, f32
    planes bitcast into one s32 buffer) assembles BIT-IDENTICAL people,
    boxes and hand peaks to the f32 'nook' packing."""
    from islx.core.config import HandConfig, PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline, _body_pack_len

    frames = (rng.rand(2, 48, 48, 3) * 255).astype(np.uint8)
    bp, hp = cpm.init_params("body25"), cpm.init_params("hand")
    outs = {}
    for mode in ("nook", "bits"):
        monkeypatch.setenv("ISLX_PACK_MODE", mode)
        pipe = FusedPosePipeline(
            bp, hp, pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
            hand_cfg=HandConfig(scale_search=(0.25,)),
            compute_dtype=jnp.float32)
        packed = pipe.device_step(frames, thre1=0.02)
        assert packed.size > 0
        if mode == "bits":   # ~62% of the nook bytes on the body section
            assert _body_pack_len(2, 25, 8, 24, 48, "bits") < \
                0.7 * _body_pack_len(2, 25, 8, 24, 48, "nook")
        outs[mode] = pipe.assemble(packed, 2)
    (res_n, box_n, pk_n), (res_b, box_b, pk_b) = outs["nook"], outs["bits"]
    np.testing.assert_array_equal(box_n, box_b)
    np.testing.assert_array_equal(pk_n, pk_b)
    for (cand_n, sub_n), (cand_b, sub_b) in zip(res_n, res_b):
        np.testing.assert_array_equal(cand_n, cand_b)
        np.testing.assert_array_equal(sub_n, sub_b)


def test_bits16_pack_mode_close_to_bits(rng, monkeypatch):
    """pack_mode='bits16' (score planes as two f16 per word, hand-found
    bits in one word per hand): integer planes stay bit-identical to
    'bits'; score planes round to f16 (~5e-4 relative — below the
    production bf16 compute path's own divergence, PARITY.md)."""
    from islx.core.config import HandConfig, PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline, _body_pack_len

    frames = (rng.rand(2, 48, 48, 3) * 255).astype(np.uint8)
    bp, hp = cpm.init_params("body25"), cpm.init_params("hand")
    outs = {}
    for mode in ("bits", "bits16"):
        monkeypatch.setenv("ISLX_PACK_MODE", mode)
        pipe = FusedPosePipeline(
            bp, hp, pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
            hand_cfg=HandConfig(scale_search=(0.25,)),
            compute_dtype=jnp.float32)
        packed = np.asarray(pipe.device_step(frames, thre1=0.02))
        if mode == "bits16":   # ~65% of the bits words on the body section
            assert _body_pack_len(2, 25, 8, 24, 48, "bits16") < \
                0.7 * _body_pack_len(2, 25, 8, 24, 48, "bits")
        body, boxes, peaks = pipe.unpack(packed, 2)
        outs[mode] = (pipe.body.unpack(body, 2), boxes, peaks)
    (pl_a, box_a, pk_a), (pl_b, box_b, pk_b) = outs["bits"], outs["bits16"]
    np.testing.assert_array_equal(box_a, box_b)
    np.testing.assert_array_equal(pk_a, pk_b)
    names = ("xy", "score", "count", "pair", "cscore", "cok")
    for name, a, b in zip(names, pl_a, pl_b):
        if a.dtype.kind == "f":
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_production_hand_config(monkeypatch):
    """HandConfig.production(): 184px default (PARITY.md #7), env override,
    explicit-arg priority; FusedPosePipeline picks it up as its default."""
    from islx.core.config import HandConfig

    monkeypatch.delenv("ISLX_HAND_SCALE", raising=False)
    cfg = HandConfig.production()
    assert cfg.scale_search == (0.5,)
    assert int(np.rint(cfg.scale_search[0] * cfg.boxsize)) == 184

    monkeypatch.setenv("ISLX_HAND_SCALE", "1.0")
    assert HandConfig.production().scale_search == (1.0,)
    assert HandConfig.production(0.25).scale_search == (0.25,)  # arg wins

    monkeypatch.delenv("ISLX_HAND_SCALE", raising=False)
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline

    pipe = FusedPosePipeline(cpm.init_params("body25"),
                             cpm.init_params("hand"))
    assert pipe.hand.cfg.scale_search == (0.5,)


@pytest.mark.parametrize("mode", ["bits", "bits16"])
def test_bit_pack_roundtrip_large_k(rng, mode):
    """Pair indices survive the bit-packed result buffer when K*K > 256.

    PoseConfig's DEFAULT max_peaks is 32, so pair = i*K+j ranges to 1023 —
    beyond the four-u8-per-word packing that K<=16 pipelines use. The packer
    must switch to two s16 per word (and the unpacker must agree) or pair
    indices silently corrupt into wrong limb endpoints."""
    import types

    from islx.ops.paf import CompactConnections
    from islx.ops.peaks import Peaks
    from islx.pipeline.batch_pose import (BatchedBodyPipeline, _body_pack_len,
                                          _pack_body)

    b, c, k, l, m = 2, 25, 32, 24, 48
    xy = jnp.asarray(rng.randint(0, 1500, size=(b, c, k, 2)), jnp.int32)
    score = jnp.asarray(rng.rand(b, c, k), jnp.float32)
    count = jnp.asarray(rng.randint(0, k + 1, size=(b, c)), jnp.int32)
    pk = Peaks(xy=xy, score=score, valid=None, count=count)
    # pair values deliberately span [0, K*K) including >= 256
    pair = jnp.asarray(rng.randint(0, k * k, size=(b, l, m)), jnp.int32)
    cok = jnp.asarray(rng.rand(b, l, m) > 0.4)
    cscore = jnp.asarray(rng.rand(b, l, m) + 0.1, jnp.float32)
    cc = CompactConnections(pair=pair, score=cscore, ok=cok)

    packed = np.asarray(_pack_body(pk, cc, mode))
    assert packed.size == _body_pack_len(b, c, k, l, m, mode)

    fake = types.SimpleNamespace(
        cfg=PoseConfig(model_type="body25", max_peaks=k),
        top_m=m, limb_seq=np.asarray(LIMB_SEQ_BODY25), pack_mode=mode)
    oxy, oscore, ocount, opair, ocscore, ocok = \
        BatchedBodyPipeline.unpack(fake, packed, b)

    np.testing.assert_array_equal(oxy, np.asarray(xy))
    np.testing.assert_array_equal(ocount, np.asarray(count))
    np.testing.assert_array_equal(opair, np.asarray(pair))   # the regression
    np.testing.assert_array_equal(ocok, np.asarray(cok))
    if mode == "bits":
        np.testing.assert_array_equal(oscore, np.asarray(score))
        np.testing.assert_array_equal(
            ocscore[ocok], np.asarray(cscore)[np.asarray(cok)])
    else:
        np.testing.assert_allclose(oscore, np.asarray(score), rtol=1e-3)
        np.testing.assert_allclose(
            ocscore[ocok], np.asarray(cscore)[np.asarray(cok)], rtol=1e-3)
