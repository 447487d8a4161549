"""Pallas kernels vs their XLA references (interpret mode on CPU; the same
kernels are validated compiled on TPU — see islx/ops/pallas_cc.py,
islx/ops/pallas_paf.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islx.ops import paf as P
from islx.ops.hand_peaks import _label_components
from islx.ops.pallas_cc import label_components_pallas
from islx.ops.pallas_paf import score_limbs_pallas


def test_cc_kernel_matches_xla(rng):
    b = rng.rand(64, 48, 5) > 0.7
    want = np.stack([np.asarray(_label_components(jnp.asarray(b[:, :, c])))
                     for c in range(5)], -1)
    got = np.asarray(label_components_pallas(jnp.asarray(b), interpret=True))
    np.testing.assert_array_equal(want, got)


def test_nms_first_k_kernel_matches_xla(rng):
    """Kernel selection == _first_k_masked(_nms_mask(...)) on the SAME
    blurred input: indices, sentinels and ordering all exact."""
    from islx.ops.pallas_peaks import nms_first_k
    from islx.ops.peaks import _first_k_masked, _nms_mask

    b, c, h, w, k = 3, 25, 46, 32, 16
    thre = 0.55
    maps = rng.rand(b, c, h, w).astype(np.float32)
    # a flat plateau exercises the >=-tie semantics
    maps[0, 0, 10:13, 5:8] = 0.9
    got = np.asarray(nms_first_k(jnp.asarray(maps), jnp.float32(thre), k,
                                 interpret=True))
    for i in range(b):
        hwc = jnp.asarray(maps[i].transpose(1, 2, 0))      # [H,W,C]
        mask = _nms_mask(hwc, thre)
        flat = mask.transpose(2, 0, 1).reshape(c, h * w)
        want = np.asarray(_first_k_masked(flat, k))
        np.testing.assert_array_equal(want, got[i])


def test_nms_mask_rows_kernel_matches_xla(rng):
    """Mask-only kernel == _nms_mask + row counts on the SAME blurred input
    (exact for thre1 > 0), and the row-blocked selection fed with the
    kernel's u8 mask + precomputed counts == the bool-mask chain."""
    from islx.ops.pallas_peaks import nms_mask_rows
    from islx.ops.peaks import _first_k_masked_rows, _nms_mask

    b, c, h, w, k = 3, 25, 46, 32, 16
    thre = 0.55
    maps = rng.rand(b, c, h, w).astype(np.float32)
    maps[0, 0, 10:13, 5:8] = 0.9            # plateau: >=-tie semantics
    mask_u8, row_cnt = nms_mask_rows(jnp.asarray(maps), jnp.float32(thre),
                                     interpret=True)
    for i in range(b):
        hwc = jnp.asarray(maps[i].transpose(1, 2, 0))      # [H,W,C]
        want_mask = np.asarray(_nms_mask(hwc, thre)).transpose(2, 0, 1)
        np.testing.assert_array_equal(want_mask,
                                      np.asarray(mask_u8[i]) != 0)
        np.testing.assert_array_equal(want_mask.sum(-1),
                                      np.asarray(row_cnt[i]))
        want_idx = np.asarray(_first_k_masked_rows(jnp.asarray(want_mask), k))
        got_idx = np.asarray(_first_k_masked_rows(mask_u8[i], k, row_cnt[i]))
        np.testing.assert_array_equal(want_idx, got_idx)


def test_find_peaks_fused_batched_mask_matches_vmap(rng):
    """kernel='mask' batched epilogue == vmap(find_peaks_fused)."""
    from islx.ops.peaks import find_peaks_fused, find_peaks_fused_batched

    b, h8, w8, c = 2, 12, 9, 7
    h_out, w_out = 96, 72
    heat8 = rng.rand(b, h8, w8, c).astype(np.float32)
    want = jax.vmap(lambda hh: find_peaks_fused(
        hh, h_out, w_out, 0.4, 8))(jnp.asarray(heat8))
    got = find_peaks_fused_batched(jnp.asarray(heat8), h_out, w_out,
                                   jnp.float32(0.4), 8, interpret=True,
                                   kernel="mask")
    np.testing.assert_array_equal(np.asarray(want.xy), np.asarray(got.xy))
    np.testing.assert_array_equal(np.asarray(want.valid),
                                  np.asarray(got.valid))
    np.testing.assert_allclose(np.asarray(want.score), np.asarray(got.score),
                               rtol=1e-5, atol=1e-6)


def test_find_peaks_fused_batched_matches_vmap(rng):
    """Batched pallas epilogue == vmap(find_peaks_fused) end to end (random
    data: NMS ties have measure zero, so results are exact)."""
    from islx.ops.peaks import find_peaks_fused, find_peaks_fused_batched

    b, h8, w8, c = 2, 12, 9, 7
    h_out, w_out = 96, 72
    heat8 = rng.rand(b, h8, w8, c).astype(np.float32)
    want = jax.vmap(lambda hh: find_peaks_fused(
        hh, h_out, w_out, 0.4, 8))(jnp.asarray(heat8))
    got = find_peaks_fused_batched(jnp.asarray(heat8), h_out, w_out,
                                   jnp.float32(0.4), 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(want.xy), np.asarray(got.xy))
    np.testing.assert_array_equal(np.asarray(want.valid),
                                  np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(want.count),
                                  np.asarray(got.count))
    np.testing.assert_allclose(np.asarray(want.score), np.asarray(got.score),
                               rtol=1e-5, atol=1e-6)


def test_paf_kernel_matches_xla(rng):
    h, w, k, c = 92, 64, 16, 25
    paf = (rng.rand(h, w, 52).astype(np.float32) - 0.4)
    count = rng.randint(1, 6, c)
    xy = np.zeros((c, k, 2), np.int32)
    valid = np.zeros((c, k), bool)
    for ch in range(c):
        xy[ch, :count[ch], 0] = rng.randint(0, w, count[ch])
        xy[ch, :count[ch], 1] = rng.randint(0, h, count[ch])
        valid[ch, :count[ch]] = True
    args = (jnp.asarray(paf), jnp.asarray(xy), jnp.asarray(valid),
            jnp.asarray(P.LIMB_SEQ_BODY25), jnp.asarray(P.MAP_IDX_BODY25))
    want = P.score_limbs(*args, 0.05, 10, orig_h=float(h))
    got = score_limbs_pallas(*args, 0.05, 10, float(h), interpret=True)
    np.testing.assert_array_equal(np.asarray(want.score),
                                  np.asarray(got.score))
    np.testing.assert_array_equal(np.asarray(want.ok), np.asarray(got.ok))
