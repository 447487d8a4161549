"""Rendering parity: islx draw_bodypose vs the reference's, pixel-exact
(same cv2 primitive sequence)."""
import numpy as np
import pytest

from conftest import has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference unavailable")


def _pose_tables(rng, njoint=25, n_people=2):
    n = njoint * n_people
    candidate = np.column_stack([
        rng.uniform(10, 190, n), rng.uniform(10, 140, n),
        rng.uniform(0.2, 1.0, n), np.arange(n, dtype=float)])
    subset = -1 * np.ones((n_people, njoint + 2))
    for p in range(n_people):
        joints = rng.choice(njoint, size=18, replace=False)
        for j in joints:
            subset[p, j] = p * njoint + j
        subset[p, -2:] = [12.0, len(joints)]
    return candidate, subset


@pytest.mark.parametrize("model_type", ["body25", "coco"])
def test_draw_bodypose_pixel_exact(rng, model_type):
    import ref_oracle

    ref_oracle._install_stubs()
    from src import util as ref_util

    from islx.utils import draw

    njoint = 25 if model_type == "body25" else 18
    candidate, subset = _pose_tables(rng, njoint)
    canvas = (rng.rand(150, 200, 3) * 255).astype(np.uint8)

    want = ref_util.draw_bodypose(canvas.copy(), candidate, subset, model_type)
    got = draw.draw_bodypose(canvas.copy(), candidate, subset, model_type)
    np.testing.assert_array_equal(got, want)
