"""Pose-net -> Keras export parity (reference model_converter.py equivalent)."""
import numpy as np
import pytest

keras = pytest.importorskip("keras")

from islx.models import cpm
from islx.models.keras_export import (build_keras_model, load_params_into,
                                      params_from_keras)


def test_hand_keras_forward_parity():
    params = cpm.init_params("hand")
    model = build_keras_model("hand", (40, 40))
    load_params_into(model, params, "hand")
    x = np.random.RandomState(0).rand(1, 40, 40, 3).astype(np.float32)
    (k_out,) = [np.asarray(o) for o in
                (model.predict(x, verbose=0),)]
    j_out = np.asarray(cpm.hand_forward(params, x))
    assert k_out.shape == j_out.shape
    np.testing.assert_allclose(k_out, j_out, atol=2e-4)


def test_body25_keras_roundtrip():
    params = cpm.init_params("body25")
    model = build_keras_model("body25", (24, 24))
    load_params_into(model, params, "body25")
    back = params_from_keras(model, "body25")
    for name, entry in params.items():
        for k, v in entry.items():
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(back[name][k]),
                                          err_msg=f"{name}/{k}")
    # parameter count matches the reference torchinfo number
    n = model.count_params()
    assert n == cpm.param_count("body25") == 26_166_084


def test_coco_keras_forward_parity():
    params = cpm.init_params("coco")
    model = build_keras_model("coco", (24, 24))
    load_params_into(model, params, "coco")
    x = np.random.RandomState(1).rand(1, 24, 24, 3).astype(np.float32)
    k_paf, k_heat = [np.asarray(o) for o in model.predict(x, verbose=0)]
    j_paf, j_heat = [np.asarray(o) for o in cpm.coco_forward(params, x)]
    np.testing.assert_allclose(k_paf, j_paf, atol=2e-4)
    np.testing.assert_allclose(k_heat, j_heat, atol=2e-4)
