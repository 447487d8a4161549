"""Whole-translator single-artifact (.keras) round trip — the reference's
one-model flow (demo_isl_translate_one_model.py:121) for islx.
"""
import numpy as np
import pytest

import jax

from islx.core.config import TranslatorConfig

keras = pytest.importorskip("keras")


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from islx.models import cpm, one_model
    from islx.models import translator as T

    cfg = TranslatorConfig()
    body = cpm.init_params("body25", jax.random.PRNGKey(0))
    hand = cpm.init_params("hand", jax.random.PRNGKey(1))
    head = T.init_params(cfg, key=jax.random.PRNGKey(2))
    path = str(tmp_path_factory.mktemp("one") / "islx-translate-v1.keras")
    one_model.export_one_model(body, hand, head, path, cfg=cfg)
    return path, cfg, body, hand, head


def _tree_allclose(a, b, atol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_roundtrip_params(artifact):
    from islx.models import one_model

    path, cfg, body, hand, head = artifact
    body2, hand2, head2 = one_model.import_one_model(path)
    _tree_allclose(body, body2)
    _tree_allclose(hand, hand2)
    _tree_allclose(head, head2)


def test_imported_head_forward_matches(artifact, rng):
    from islx.models import one_model
    from islx.models import translator as T

    path, cfg, _, _, head = artifact
    _, _, head2 = one_model.import_one_model(path)
    x = rng.randn(2, cfg.window_size, cfg.feature_dim).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(T.forward(head, x)), np.asarray(T.forward(head2, x)),
        atol=1e-5)


def test_artifact_loads_in_stock_keras(artifact, rng):
    """The point of the portable artifact: plain keras, no custom classes
    (unlike the reference's TorchModuleWrapper composite)."""
    path, cfg, _, _, _ = artifact
    model = keras.models.load_model(path, compile=False)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    crop = rng.rand(1, 32, 32, 3).astype(np.float32)
    win = rng.randn(1, cfg.window_size, cfg.feature_dim).astype(np.float32)
    outs = model.predict([img, crop, win], verbose=0)
    assert outs[0].shape[-1] == 52          # body25 PAF
    assert outs[1].shape[-1] == 26          # body25 heatmap
    assert outs[2].shape[-1] == 22          # hand heatmap
    assert outs[3].shape == (1, cfg.n_classes)
    np.testing.assert_allclose(outs[3].sum(), 1.0, rtol=1e-4)


def test_import_rejects_foreign_artifact(tmp_path):
    from islx.models import one_model

    m = keras.Sequential([keras.layers.Dense(3)])
    m.build((None, 4))
    path = str(tmp_path / "foreign.keras")
    m.save(path)
    with pytest.raises(ValueError, match="one-model"):
        one_model.import_one_model(path)
