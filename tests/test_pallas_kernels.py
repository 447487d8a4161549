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
