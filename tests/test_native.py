"""Native C++ grouping kernel vs the numpy reference implementation."""
import numpy as np
import pytest

from islx.ops import grouping, native
from islx.ops.paf import LIMB_SEQ_BODY25, LIMB_SEQ_COCO


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("g++ unavailable / native build failed")
    return native.get_lib()


def _random_batch(rng, b=6, k=16, c=25, l_tab=LIMB_SEQ_BODY25, m=48):
    l = l_tab.shape[0]
    count = rng.randint(0, 6, size=(b, c)).astype(np.int32)
    xy = rng.randint(0, 200, size=(b, c, k, 2)).astype(np.int32)
    score = rng.rand(b, c, k).astype(np.float32)
    pair = np.zeros((b, l, m), np.int32)
    cscore = np.zeros((b, l, m), np.float32)
    cok = np.zeros((b, l, m), bool)
    for f in range(b):
        for li in range(l):
            a, bb = l_tab[li]
            n_a, n_b = count[f, a], count[f, bb]
            cands = []
            for i in range(n_a):
                for j in range(n_b):
                    if rng.rand() < 0.5:
                        cands.append((i * k + j, rng.rand()))
            cands.sort(key=lambda t: -t[1])
            for t, (p, s) in enumerate(cands[:m]):
                pair[f, li, t] = p
                cscore[f, li, t] = s
                cok[f, li, t] = True
    return xy, score, count, pair, cscore, cok


@pytest.mark.parametrize("l_tab,njoint", [(LIMB_SEQ_BODY25, 26),
                                          (LIMB_SEQ_COCO, 19)])
def test_matches_numpy(lib, rng, l_tab, njoint):
    c = njoint - 1
    for trial in range(5):
        xy, score, count, pair, cscore, cok = _random_batch(
            rng, b=4, c=c, l_tab=l_tab)
        got = native.assemble_batch(xy, score, count, pair, cscore, cok,
                                    16, l_tab, njoint)
        for f in range(4):
            want_c, want_s = grouping.assemble_sorted(
                xy[f], score[f], count[f], pair[f], cscore[f], cok[f],
                16, l_tab, njoint)
            np.testing.assert_array_equal(got[f][0], want_c)
            np.testing.assert_array_equal(got[f][1], want_s)


def test_empty(lib):
    xy = np.zeros((2, 25, 16, 2), np.int32)
    score = np.zeros((2, 25, 16), np.float32)
    count = np.zeros((2, 25), np.int32)
    pair = np.zeros((2, 24, 48), np.int32)
    cscore = np.zeros((2, 24, 48), np.float32)
    cok = np.zeros((2, 24, 48), bool)
    out = native.assemble_batch(xy, score, count, pair, cscore, cok, 16,
                                LIMB_SEQ_BODY25, 26)
    for cand, subset in out:
        assert cand.shape == (0, 4)
        assert subset.shape == (0, 27)
