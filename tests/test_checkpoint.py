"""Checkpointing: pytree round trips, translator bundles, train resume."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islx.core import checkpoint as ckpt
from islx.core.config import TranslatorConfig
from islx.models import cpm
from islx.models import translator as T


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pytree_roundtrip(tmp_path):
    params = T.init_params(TranslatorConfig(), jax.random.PRNGKey(0))
    path = str(tmp_path / "params")
    ckpt.save_pytree(path, params)
    assert ckpt.exists(path)
    restored = ckpt.load_pytree(path, like=params)
    _trees_equal(params, restored)


def test_bundle_roundtrip(tmp_path):
    body = cpm.init_params("body25", jax.random.PRNGKey(1))
    hand = cpm.init_params("hand", jax.random.PRNGKey(2))
    head = T.init_params(TranslatorConfig(), jax.random.PRNGKey(3))
    d = str(tmp_path / "bundle")
    ckpt.save_bundle(d, body, hand, head, "body25")
    b2, h2, hd2, mt = ckpt.load_bundle(d)
    assert mt == "body25"
    _trees_equal(body, b2)
    _trees_equal(hand, h2)
    _trees_equal(head, hd2)


def test_fit_resume(tmp_path, rng):
    from islx.isl import train as TR

    cfg = TranslatorConfig()
    x = rng.randn(8, cfg.window_size, cfg.feature_dim).astype(np.float32)
    y = rng.randint(0, cfg.n_classes, 8)
    d = str(tmp_path / "ckpt")
    TR.fit(x, y, epochs=2, batch_size=4, cfg=cfg, checkpoint_dir=d,
           verbose=False)
    assert ckpt.exists(os.path.join(d, "latest"))
    # resume: runs only the remaining epoch, still returns valid params
    params = TR.fit(x, y, epochs=3, batch_size=4, cfg=cfg, checkpoint_dir=d,
                    verbose=False)
    probs = T.forward(params, x[:2])
    assert np.all(np.isfinite(np.asarray(probs)))


def test_fit_resume_on_mesh(tmp_path, rng):
    """Resume keeps the loaded Adam moments when sharding onto a mesh."""
    from islx.isl import train as TR
    from islx.parallel import mesh as M

    mesh = M.make_mesh(n_data=4, n_model=2)
    cfg = TranslatorConfig()
    x = rng.randn(8, cfg.window_size, cfg.feature_dim).astype(np.float32)
    y = rng.randint(0, cfg.n_classes, 8)
    d = str(tmp_path / "ckpt")
    TR.fit(x, y, epochs=1, batch_size=8, cfg=cfg, mesh=mesh,
           checkpoint_dir=d, verbose=False)
    params = TR.fit(x, y, epochs=2, batch_size=8, cfg=cfg, mesh=mesh,
                    checkpoint_dir=d, verbose=False)
    probs = T.forward(params, x[:2])
    assert np.all(np.isfinite(np.asarray(probs)))


def test_trained_bn_stats_updated(rng):
    """All three BatchNorms' running stats move during training (review
    finding: bn1/bn2 previously kept init stats)."""
    from islx.isl import train as TR

    cfg = TranslatorConfig()
    opt = TR.make_optimizer(1e-3)
    state, _ = TR.init_state(cfg, opt, jax.random.PRNGKey(0))
    before = {k: np.asarray(state.params[k]["mean"]).copy()
              for k in ("bn0", "bn1", "bn2")}
    step = TR.make_train_step(opt, cfg)
    x = jnp.asarray(rng.randn(8, cfg.window_size, cfg.feature_dim),
                    jnp.float32)
    y = jnp.asarray(rng.randint(0, cfg.n_classes, 8))
    state, _ = step(state, x, y, jax.random.PRNGKey(1))
    for k in ("bn0", "bn1", "bn2"):
        assert not np.allclose(np.asarray(state.params[k]["mean"]),
                               before[k]), k
