"""Golden end-to-end parity: islx Body/Hand vs the REFERENCE pipeline
executing on identical synthetic network outputs (see ref_oracle.py).
This validates the full device pipeline — resize plumbing, scale averaging,
NMS, PAF scoring, grouping, CC hand peaks — against the reference bit-for-bit
on coordinates and to float tolerance on scores."""
import numpy as np
import pytest

import jax.numpy as jnp

from conftest import has_reference

import ref_oracle
from islx.pose.body import Body
from islx.pose.hand import Hand
from islx.pose.detector import hand_detect

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo unavailable")


def _blobby(rng, h, w, c, n_lo=1, n_hi=4, amp=0.9, sigma=3.0):
    hm = np.zeros((h, w, c), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for ch in range(c):
        for _ in range(rng.randint(n_lo, n_hi)):
            # fractional centres: pixel-centred gaussians create bit-exact
            # plateau ties after the x8 cubic upsample, which `>=`-NMS resolves
            # by float ulps — degenerate data real conv nets never produce.
            cy, cx = rng.randint(2, h - 2) + rng.uniform(-0.3, 0.3), \
                rng.randint(2, w - 2) + rng.uniform(-0.3, 0.3)
            hm[:, :, ch] += amp * rng.uniform(0.5, 1.0) * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.0 ** 2))
    hm += (rng.rand(h, w, 1) * 1e-3).astype(np.float32)  # tie breaker
    return hm


def _smooth_noise(rng, h, w, c, scale=0.5):
    from scipy.ndimage import gaussian_filter

    x = rng.randn(h, w, c).astype(np.float32)
    for ch in range(c):
        x[:, :, ch] = gaussian_filter(x[:, :, ch], sigma=2)
    return (x * scale / (np.abs(x).max() + 1e-9) * 3).astype(np.float32)


@pytest.mark.parametrize("model_type", ["body25", "coco"])
def test_body_parity(model_type, rng):
    njoint = 26 if model_type == "body25" else 19
    npaf = 52 if model_type == "body25" else 38
    ori = (rng.rand(92, 120, 3) * 255).astype(np.uint8)
    # scale 0.5 -> net input 184x240 -> output 23x30
    heat = _blobby(rng, 23, 30, njoint)
    paf = _smooth_noise(rng, 23, 30, npaf)

    ref_out = {(184, 240): (paf.transpose(2, 0, 1)[None],
                            heat.transpose(2, 0, 1)[None])}
    cand_ref, subset_ref = ref_oracle.reference_body(ori, ref_out, model_type)

    def stub_forward(params, x, compute_dtype=None):
        assert x.shape[1:3] == (184, 240), x.shape
        return jnp.asarray(paf)[None], jnp.asarray(heat)[None]

    body = Body(weights={}, model_type=model_type, forward_fn=stub_forward)
    cand, subset = body(ori)

    assert cand.shape == cand_ref.shape, (cand.shape, cand_ref.shape)
    np.testing.assert_array_equal(cand[:, :2], cand_ref[:, :2])  # exact coords
    np.testing.assert_allclose(cand[:, 2], cand_ref[:, 2], atol=1e-4)
    np.testing.assert_array_equal(cand[:, 3], cand_ref[:, 3])
    assert subset.shape == subset_ref.shape, (subset.shape, subset_ref.shape)
    np.testing.assert_array_equal(subset[:, :-2], subset_ref[:, :-2])
    np.testing.assert_allclose(subset[:, -2], subset_ref[:, -2], atol=1e-3)
    np.testing.assert_array_equal(subset[:, -1], subset_ref[:, -1])


def test_body_parity_with_stride_padding(rng):
    """Image size whose scaled input is NOT stride-aligned: exercises the
    pad-right/down + de-pad path against the reference (src/util.py:12-32,
    src/body.py:54,71)."""
    ori = (rng.rand(90, 115, 3) * 255).astype(np.uint8)
    # scale = 0.5*368/90 -> resized 184x235 -> padded 184x240 -> out 23x30
    heat = _blobby(rng, 23, 30, 26)
    paf = _smooth_noise(rng, 23, 30, 52)
    ref_out = {(184, 240): (paf.transpose(2, 0, 1)[None],
                            heat.transpose(2, 0, 1)[None])}
    cand_ref, subset_ref = ref_oracle.reference_body(ori, ref_out, "body25")

    def stub_forward(params, x, compute_dtype=None):
        assert x.shape[1:3] == (184, 240), x.shape
        return jnp.asarray(paf)[None], jnp.asarray(heat)[None]

    body = Body(weights={}, model_type="body25", forward_fn=stub_forward)
    cand, subset = body(ori)
    assert cand.shape == cand_ref.shape
    np.testing.assert_array_equal(cand[:, :2], cand_ref[:, :2])
    np.testing.assert_allclose(cand[:, 2], cand_ref[:, 2], atol=1e-4)
    assert subset.shape == subset_ref.shape
    np.testing.assert_array_equal(subset[:, :-2], subset_ref[:, :-2])


@pytest.mark.parametrize("ref_compat", [False, True])
def test_body_multiscale_averaging(rng, ref_compat):
    """Multi-scale map averaging, incl. reproducing the reference's buggy
    accumulation (src/body.py:80: avg += avg + heat/n) behind
    ref_compat_averaging. Oracle: direct numpy/cv2 port of the scale loop
    (the reference's own source hardcodes scale_search=[0.5], so its code
    cannot execute multi-scale)."""
    import cv2

    from islx.core.config import PoseConfig

    ori = (rng.rand(92, 120, 3) * 255).astype(np.uint8)
    outs = {}
    jax_outs = {}
    for (hin, win), (h8, w8) in [((184, 240), (23, 30)),
                                 ((368, 480), (46, 60))]:
        heat = _blobby(rng, h8, w8, 26)
        paf = _smooth_noise(rng, h8, w8, 52)
        outs[(hin, win)] = (heat, paf)
        jax_outs[(hin, win)] = (jnp.asarray(paf)[None], jnp.asarray(heat)[None])

    # numpy oracle of src/body.py:51-81 for scales (0.5, 1.0)
    heat_avg = np.zeros((92, 120, 26), np.float32)
    paf_avg = np.zeros((92, 120, 52), np.float32)
    n = 2
    for s, (hin, win) in [(0.5, (184, 240)), (1.0, (368, 480))]:
        heat, paf = outs[(hin, win)]

        def to_orig(m):
            m = cv2.resize(m, (0, 0), fx=8, fy=8,
                           interpolation=cv2.INTER_CUBIC)
            m = m[:hin, :win]
            return cv2.resize(m, (120, 92), interpolation=cv2.INTER_CUBIC)

        if ref_compat:
            heat_avg = heat_avg + heat_avg + to_orig(heat) / n
        else:
            heat_avg = heat_avg + to_orig(heat) / n
        paf_avg = paf_avg + to_orig(paf) / n

    def stub_forward(params, x, compute_dtype=None):
        return jax_outs[tuple(x.shape[1:3])]

    cfg = PoseConfig(model_type="body25", scale_search=(0.5, 1.0),
                     ref_compat_averaging=ref_compat)
    body = Body(weights={}, model_type="body25", config=cfg,
                forward_fn=stub_forward)
    got_heat, got_paf = body.maps(ori)
    assert np.abs(got_heat - heat_avg).max() < 2e-4
    assert np.abs(got_paf - paf_avg).max() < 2e-4


def test_hand_parity(rng):
    crop = (rng.rand(46, 46, 3) * 255).astype(np.uint8)
    # scales [.5,1,1.5,2] * 368/46 -> inputs 184/368/552/736 -> outputs 23/46/69/92
    ref_out = {}
    jax_out = {}
    for size, osize in [(184, 23), (368, 46), (552, 69), (736, 92)]:
        hm = _blobby(rng, osize, osize, 22, 0, 3, amp=0.7)
        ref_out[(size, size)] = hm.transpose(2, 0, 1)[None]
        jax_out[(size, size)] = jnp.asarray(hm)[None]

    peaks_ref = ref_oracle.reference_hand(crop, ref_out)

    def stub_forward(params, x, compute_dtype=None):
        return jax_out[tuple(x.shape[1:3])]

    hand = Hand(weights={}, forward_fn=stub_forward)
    peaks = hand(crop)
    np.testing.assert_array_equal(peaks, peaks_ref)


def test_hand_detect_parity(rng):
    """Our detector vs reference util.handDetect on random pose tables."""
    for _ in range(20):
        n = rng.randint(6, 30)
        candidate = np.column_stack([
            rng.uniform(0, 200, n), rng.uniform(0, 150, n),
            rng.uniform(0, 1, n), np.arange(n, dtype=float)])
        n_person = rng.randint(1, 4)
        subset = -1 * np.ones((n_person, 27))
        for p in range(n_person):
            joints = rng.choice(n, size=min(n, 10), replace=False)
            slots = rng.choice(25, size=len(joints), replace=False)
            subset[p, slots] = joints
        img = np.zeros((150, 200, 3), np.uint8)
        want = ref_oracle.reference_hand_detect(candidate, subset, img)
        got = hand_detect(candidate, subset, img.shape)
        assert got == want
