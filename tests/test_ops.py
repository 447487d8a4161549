"""Kernel-vs-oracle unit tests: resize (cv2), blur (scipy), NMS peaks,
connected components (scipy.ndimage)."""
import numpy as np
import pytest

import jax.numpy as jnp

from islx.ops import blur, peaks, preprocess, resize
from islx.ops.hand_peaks import find_hand_peaks


class TestResize:
    @pytest.mark.parametrize("shape,out", [
        ((46, 60), (92, 120)),      # 2x up
        ((92, 120), (23, 30)),      # 4x down
        ((30, 41), (53, 67)),       # odd sizes
        ((23, 30), (184, 240)),     # x8 heatmap upsample
    ])
    def test_matches_cv2_float(self, shape, out, rng):
        import cv2

        img = rng.rand(*shape, 3).astype(np.float32)
        want = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_CUBIC)
        got = np.asarray(resize.resize_cubic(jnp.asarray(img), out[0], out[1]))
        assert np.abs(want - got).max() < 1e-4

    def test_matches_cv2_uint8_source(self, rng):
        import cv2

        img = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
        want = cv2.resize(img, (0, 0), fx=1.7, fy=1.7,
                          interpolation=cv2.INTER_CUBIC).astype(np.float32)
        got = np.asarray(resize.resize_by_factor(jnp.asarray(img), 1.7, 1.7,
                                                 saturate_uint8=True))
        # cv2's u8 path uses 2^11 fixed-point weights; our float weights land
        # within 1 intensity level of its quantized result.
        assert np.abs(want - got).max() <= 1.0

    def test_output_size_rounding(self):
        import cv2

        img = np.zeros((93, 121, 3), np.uint8)
        want = cv2.resize(img, (0, 0), fx=0.5, fy=0.5,
                          interpolation=cv2.INTER_CUBIC).shape
        got = resize.resize_by_factor(jnp.asarray(img), 0.5, 0.5).shape
        assert want[:2] == got[:2]

    def test_dynamic_crop_resize_batch(self, rng):
        """The all-batched crop-resize (one gather + two batched matmuls)
        is bit-equal to the per-crop dynamic form."""
        from islx.ops.resize import (dynamic_crop_resize,
                                     dynamic_crop_resize_batch)

        b, h, w, n, out = 4, 60, 80, 10, 46
        frames = (rng.rand(b, h, w, 3) * 255).astype(np.uint8)
        fidx = rng.randint(0, b, n).astype(np.int32)
        cw = rng.randint(8, 40, n).astype(np.int32)
        x0 = np.minimum(rng.randint(0, w - 8, n), w - cw).astype(np.int32)
        y0 = np.minimum(rng.randint(0, h - 8, n), h - cw).astype(np.int32)
        batch = np.asarray(dynamic_crop_resize_batch(
            jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(x0),
            jnp.asarray(y0), jnp.asarray(cw), out))
        for i in range(n):
            one = np.asarray(dynamic_crop_resize(
                jnp.asarray(frames[fidx[i]]), jnp.int32(x0[i]),
                jnp.int32(y0[i]), jnp.int32(cw[i]), out))
            np.testing.assert_array_equal(batch[i], one)

    def test_batched(self, rng):
        img = rng.rand(4, 30, 40, 2).astype(np.float32)
        out = resize.resize_cubic(jnp.asarray(img), 60, 80)
        single = resize.resize_cubic(jnp.asarray(img[1]), 60, 80)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single),
                                   atol=1e-6)


class TestBlur:
    @pytest.mark.parametrize("shape", [(40, 56), (23, 30), (5, 7)])
    def test_matches_scipy(self, shape, rng):
        from scipy.ndimage import gaussian_filter

        x = rng.randn(*shape).astype(np.float32)
        want = gaussian_filter(x, sigma=3)
        got = np.asarray(blur.gaussian_blur(jnp.asarray(x), 3.0))
        assert np.abs(want - got).max() < 1e-5

    def test_channels(self, rng):
        from scipy.ndimage import gaussian_filter

        x = rng.randn(40, 30, 5).astype(np.float32)
        got = np.asarray(blur.gaussian_blur(jnp.asarray(x), 3.0))
        for c in range(5):
            want = gaussian_filter(x[:, :, c], sigma=3)
            assert np.abs(want - got[:, :, c]).max() < 1e-5


class TestPreprocess:
    def test_matches_reference_semantics(self, rng):
        """Oracle: pad right/down to stride multiple with 128, /256-0.5
        (src/util.py:12-32 + src/body.py:55)."""
        img = (rng.rand(45, 62, 3) * 255).astype(np.uint8)
        out, (pd, pr) = preprocess.pad_normalize(jnp.asarray(img), 8, 128)
        assert (pd, pr) == (3, 2)
        assert out.shape == (1, 48, 64, 3)
        np.testing.assert_allclose(
            np.asarray(out[0, :45, :62]), img.astype(np.float32) / 256 - 0.5,
            atol=1e-6)
        assert np.all(np.asarray(out[0, 45:, :]) == 128 / 256 - 0.5)
        assert np.all(np.asarray(out[0, :, 62:]) == 128 / 256 - 0.5)


def _oracle_peaks(heatmap, thre1):
    """numpy oracle of reference NMS (src/body.py:86-107 semantics)."""
    from scipy.ndimage import gaussian_filter

    out = []
    for c in range(heatmap.shape[2]):
        m = heatmap[:, :, c]
        b = gaussian_filter(m, sigma=3)
        up = np.zeros_like(b); up[1:, :] = b[:-1, :]
        dn = np.zeros_like(b); dn[:-1, :] = b[1:, :]
        lf = np.zeros_like(b); lf[:, 1:] = b[:, :-1]
        rt = np.zeros_like(b); rt[:, :-1] = b[:, 1:]
        binary = (b >= up) & (b >= dn) & (b >= lf) & (b >= rt) & (b > thre1)
        ys, xs = np.nonzero(binary)
        out.append([(x, y, m[y, x]) for x, y in zip(xs, ys)])
    return out


class TestPeaks:
    def _random_heatmap(self, rng, h=60, w=80, c=5):
        """Smooth random heatmaps with a handful of blobs per channel."""
        hm = np.zeros((h, w, c), np.float32)
        for ch in range(c):
            for _ in range(rng.randint(1, 5)):
                cy, cx = rng.randint(5, h - 5), rng.randint(5, w - 5)
                yy, xx = np.mgrid[0:h, 0:w]
                hm[:, :, ch] += 0.8 * np.exp(
                    -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 4.0 ** 2))
        return hm

    def test_matches_oracle(self, rng):
        hm = self._random_heatmap(rng)
        want = _oracle_peaks(hm, 0.1)
        got = peaks.find_peaks(jnp.asarray(hm), 0.1, k=32)
        for c in range(hm.shape[2]):
            n = int(got.count[c])
            assert n == len(want[c]), f"channel {c}"
            for k in range(n):
                wx, wy, ws = want[c][k]
                assert (int(got.xy[c, k, 0]), int(got.xy[c, k, 1])) == (wx, wy)
                assert abs(float(got.score[c, k]) - ws) < 1e-6

    def test_empty_channel(self):
        hm = np.zeros((40, 40, 3), np.float32)
        got = peaks.find_peaks(jnp.asarray(hm), 0.1, k=8)
        assert np.all(np.asarray(got.count) == 0)
        assert not np.any(np.asarray(got.valid))

    def test_first_k_masked_dense(self, rng):
        """The rank-based selection is exact for ANY density — including
        clusters far denser than the old two-stage block top-k could
        handle — and returns row-major order with sentinel padding."""
        from islx.ops.peaks import _first_k_masked

        c, n, k = 4, 5000, 16
        mask = np.zeros((c, n), bool)
        mask[0, 100:150] = True                 # 50 in one 2048-block
        mask[1, [0, n - 1]] = True
        mask[2, rng.rand(n) < 0.3] = True       # very dense
        got = np.asarray(_first_k_masked(jnp.asarray(mask), k))
        for ch in range(c):
            want = np.flatnonzero(mask[ch])[:k]
            np.testing.assert_array_equal(got[ch, :len(want)], want)
            assert np.all(got[ch, len(want):] == n)

    def test_first_k_masked_rows_matches_flat(self, rng):
        """The row-blocked selection (production default) == the flat rank
        chain for adversarial layouts: empty channels, single-row clusters
        denser than K, peaks on row/column borders, very dense masks."""
        from islx.ops.peaks import _first_k_masked, _first_k_masked_rows

        c, h, w, k = 6, 37, 53, 16
        mask = np.zeros((c, h, w), bool)
        mask[1, 5, :40] = True                   # one row holds > K peaks
        mask[2, [0, h - 1], [0, w - 1]] = True   # corners
        mask[3] = rng.rand(h, w) < 0.4           # dense
        mask[4, :, 0] = True                     # full first column
        mask[5, h - 1, w - 1] = True             # single last element
        want = np.asarray(_first_k_masked(
            jnp.asarray(mask.reshape(c, h * w)), k))
        got = np.asarray(_first_k_masked_rows(jnp.asarray(mask), k))
        np.testing.assert_array_equal(got, want)


def _oracle_hand_peak(map_ori, thre):
    """numpy oracle of reference hand CC peak (src/hand.py:59-73 semantics),
    with scipy.ndimage.label (8-connectivity) standing in for skimage."""
    from scipy.ndimage import gaussian_filter, label

    b = gaussian_filter(map_ori, sigma=3)
    binary = b > thre
    if binary.sum() == 0:
        return (0, 0)
    lab, n = label(binary, structure=np.ones((3, 3)))
    sums = [map_ori[lab == i].sum() for i in range(1, n + 1)]
    best = int(np.argmax(sums)) + 1
    masked = np.where(lab == best, map_ori, 0)
    # npmax (src/util.py:394-399): first row-major occurrence of the max
    i, j = np.unravel_index(np.argmax(masked), masked.shape)
    return (j, i)


class TestHandPeaks:
    def test_matches_oracle(self, rng):
        h, w, c = 60, 60, 21
        hm = np.zeros((h, w, c), np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        for ch in range(c):
            for _ in range(rng.randint(0, 4)):
                cy, cx = rng.randint(3, h - 3), rng.randint(3, w - 3)
                hm[:, :, ch] += rng.uniform(0.3, 1.0) * np.exp(
                    -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0 ** 2))
        got = find_hand_peaks(jnp.asarray(hm), 0.05)
        for ch in range(c):
            want = _oracle_hand_peak(hm[:, :, ch], 0.05)
            assert (int(got.xy[ch, 0]), int(got.xy[ch, 1])) == want, f"ch {ch}"


    def test_refine_matches_full_upsample(self, rng):
        """Coarse-to-fine refine == argmax of the FULL x8 cubic upsample on
        blob-shaped heatmaps (the op's exactness contract; the blobby shape
        guarantees the true peak lies inside the refine window)."""
        from islx.ops.hand_peaks import find_hand_peaks_refine
        from islx.ops.resize import resize_cubic

        h8 = w8 = 23
        c = 21
        hm = np.zeros((h8, w8, c), np.float32)
        yy, xx = np.mgrid[0:h8, 0:w8]
        for ch in range(c):
            cy, cx = rng.randint(2, h8 - 2, 2)
            hm[:, :, ch] = rng.uniform(0.4, 1.2) * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.7 ** 2))
        got = find_hand_peaks_refine(jnp.asarray(hm), 0.05)
        big = np.asarray(resize_cubic(jnp.asarray(hm), h8 * 8, w8 * 8))
        for ch in range(c):
            p = int(np.argmax(big[:, :, ch].reshape(-1)))
            wy, wx = p // (w8 * 8), p % (w8 * 8)
            assert bool(got.found[ch])
            assert (int(got.xy[ch, 0]), int(got.xy[ch, 1])) == (wx, wy), ch

    def test_two_blob_tiebreak(self):
        """Larger-sum component wins even if the other has the taller peak."""
        h = w = 50
        yy, xx = np.mgrid[0:h, 0:w]
        wide = 0.5 * np.exp(-((yy - 35) ** 2 + (xx - 35) ** 2) / (2 * 6.0 ** 2))
        tall = 0.9 * np.exp(-((yy - 10) ** 2 + (xx - 10) ** 2) / (2 * 1.5 ** 2))
        hm = (wide + tall).astype(np.float32)[:, :, None]
        got = find_hand_peaks(jnp.asarray(hm), 0.05)
        want = _oracle_hand_peak(hm[:, :, 0], 0.05)
        assert (int(got.xy[0, 0]), int(got.xy[0, 1])) == want


class TestFusedPeaks:
    def test_matches_unfused_chain(self, rng):
        """find_peaks_fused(heat8) == find_peaks(resize_cubic(heat8)) —
        identical positions/validity/count, scores equal to the exact cubic
        upsample values (the blur folds algebraically into the upsample)."""
        from islx.ops.peaks import find_peaks, find_peaks_fused
        from islx.ops.resize import resize_cubic

        h8, w8, c = 12, 16, 7
        hb, wb = h8 * 8, w8 * 8
        yy, xx = np.mgrid[0:h8, 0:w8]
        hm = np.zeros((h8, w8, c), np.float32)
        for ch in range(c):
            for _ in range(rng.randint(1, 4)):
                # continuous, asymmetric blob centres: a symmetric blob
                # upsampled x8 creates an exact 2-pixel NMS plateau whose
                # tie the two float paths resolve differently (documented
                # production divergence) — not what this test measures
                cy = rng.randint(1, h8 - 1) + rng.uniform(0.05, 0.45)
                cx = rng.randint(1, w8 - 1) + rng.uniform(0.05, 0.45)
                sy, sx = rng.uniform(1.0, 1.6), rng.uniform(1.0, 1.6)
                hm[:, :, ch] += rng.uniform(0.5, 1.5) * np.exp(
                    -((yy - cy) ** 2 / sy + (xx - cx) ** 2 / sx) / 2)

        full = resize_cubic(jnp.asarray(hm), hb, wb)
        want = find_peaks(full, 0.1, 16)
        for two_stage in (False, True):
            got = find_peaks_fused(jnp.asarray(hm), hb, wb, 0.1, 16,
                                   two_stage=two_stage)
            np.testing.assert_array_equal(np.asarray(got.xy),
                                          np.asarray(want.xy))
            np.testing.assert_array_equal(np.asarray(got.valid),
                                          np.asarray(want.valid))
            np.testing.assert_array_equal(np.asarray(got.count),
                                          np.asarray(want.count))
            np.testing.assert_allclose(np.asarray(got.score),
                                       np.asarray(want.score),
                                       atol=1e-5)

    def test_empty(self):
        from islx.ops.peaks import find_peaks_fused

        got = find_peaks_fused(jnp.zeros((8, 8, 3)), 64, 64, 0.1, 8)
        assert int(got.count.sum()) == 0
        assert not bool(got.valid.any())
