"""Translator head parity vs a keras model built exactly like the reference's
(demo_isl_translate.py:72-100), plus featurizer parity vs reference util."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islx.core.config import TranslatorConfig
from islx.isl import features as F
from islx.models import translator as T

from conftest import has_reference


def _build_keras_head(cfg):
    # the reference-graph builder now lives in the package (it also feeds
    # the one-model artifact, islx.models.one_model)
    return T.build_keras_head(cfg)


@pytest.fixture(scope="module")
def keras_pair():
    cfg = TranslatorConfig()
    keras_model = _build_keras_head(cfg)
    weight_lists = [l.get_weights() for l in keras_model.layers
                    if l.get_weights()]
    params = T.from_keras_weights(weight_lists)
    return cfg, keras_model, params


def test_keras_parity_full_window(keras_pair, rng):
    cfg, keras_model, params = keras_pair
    x = rng.randn(3, cfg.window_size, cfg.feature_dim).astype(np.float32)
    want = keras_model.predict(x, verbose=0)
    got = np.asarray(T.forward(params, jnp.asarray(x)))
    assert np.abs(want - got).max() < 1e-4


def test_keras_parity_masked_window(keras_pair, rng):
    """Zero-padded window tails must be masked identically (keras Masking)."""
    cfg, keras_model, params = keras_pair
    x = rng.randn(4, cfg.window_size, cfg.feature_dim).astype(np.float32)
    x[0, 15:] = 0.0   # padded tail
    x[1, 5:] = 0.0
    x[2, :] = np.abs(x[2])  # no padding
    want = keras_model.predict(x, verbose=0)
    got = np.asarray(T.forward(params, jnp.asarray(x)))
    assert np.abs(want - got).max() < 1e-4


def test_keras_export_roundtrip(keras_pair, rng):
    """islx-trained head -> keras get_weights lists -> keras model predicts
    identically (the reference model_converter.py direction, inverted)."""
    cfg, keras_model, params = keras_pair
    wl = T.to_keras_weights(params)
    weighted = [l for l in keras_model.layers if l.get_weights()]
    assert len(weighted) == len(wl)
    for layer, ws in zip(weighted, wl):
        layer.set_weights(ws)
    x = rng.randn(2, cfg.window_size, cfg.feature_dim).astype(np.float32)
    want = keras_model.predict(x, verbose=0)
    got = np.asarray(T.forward(params, jnp.asarray(x)))
    assert np.abs(want - got).max() < 1e-4


def test_probabilities_and_shapes():
    cfg = TranslatorConfig()
    params = T.init_params(cfg)
    x = jnp.ones((2, cfg.window_size, cfg.feature_dim))
    probs = T.forward(params, x)
    assert probs.shape == (2, cfg.n_classes)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_train_mode_dropout_differs():
    cfg = TranslatorConfig()
    params = T.init_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(7),
                          (2, cfg.window_size, cfg.feature_dim))
    a = T.forward(params, x, train=True, rng=jax.random.PRNGKey(0))
    b = T.forward(params, x, train=True, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_expressions_match_reference():
    from islx.isl.expressions import EXPRESSIONS, N_CLASSES

    assert N_CLASSES == 167
    if has_reference():
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            from src.expression_mapping import expression_mapping
        finally:
            sys.path.remove("/root/reference")
        assert EXPRESSIONS == expression_mapping


@pytest.mark.skipif(not has_reference(), reason="reference unavailable")
def test_featurizer_parity(rng):
    """frame_features == reference get_bodypose+get_handpose+populate_features."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from src import util as ref_util
    finally:
        sys.path.remove("/root/reference")

    for _ in range(10):
        n = rng.randint(5, 30)
        candidate = np.column_stack([
            rng.uniform(0, 200, n), rng.uniform(0, 150, n),
            rng.uniform(0, 1, n), np.arange(n, dtype=float)])
        n_person = rng.randint(1, 3)
        subset = -1 * np.ones((n_person, 27))
        for p in range(n_person):
            joints = rng.choice(n, size=min(n, 12), replace=False)
            slots = rng.choice(25, size=len(joints), replace=False)
            subset[p, slots] = joints
        hands = []
        for _ in range(rng.randint(0, 3)):
            pk = rng.randint(0, 100, (21, 2))
            pk[rng.rand(21) < 0.3] = 0
            hands.append(pk)

        want_circ, want_sticks = ref_util.get_bodypose(candidate, subset, "body25")
        got_circ, got_sticks = F.get_bodypose(candidate, subset, "body25")
        assert got_circ == [tuple(map(float, c)) for c in want_circ]
        np.testing.assert_allclose(np.array(got_sticks, dtype=float).reshape(-1, 4)
                                   if got_sticks else np.zeros((0, 4)),
                                   np.array(want_sticks, dtype=float).reshape(-1, 4)
                                   if want_sticks else np.zeros((0, 4)),
                                   atol=1e-9)

        if len(hands) <= 2:  # reference crashes on >2 hands
            want_edges, want_peaks = ref_util.get_handpose(hands)
            got_edges, got_peaks = F.get_handpose(hands)
            assert str(got_edges) == str(want_edges)
            assert str(got_peaks) == str(want_peaks)

            got_feat = F.populate_features(got_circ, got_peaks)
            assert got_feat.shape == (156,)
