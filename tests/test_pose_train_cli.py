"""islx.cli.pose_train: CPM fine-tuning CLI — single-device, data-parallel
mesh, and GPipe pipeline paths produce equivalent checkpoints (the GPipe
gradient equals the full-batch gradient — islx/parallel/pipeline.py)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from islx.cli import pose_train as CLI  # noqa: E402
from islx.core import weights as W  # noqa: E402


@pytest.fixture(scope="module")
def hand_samples(tmp_path_factory):
    d = tmp_path_factory.mktemp("hand_ds")
    rng = np.random.RandomState(0)
    for i in range(4):
        img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
        kp = rng.rand(21, 2).astype(np.float32) * 48 + 4
        np.savez(d / f"s{i}.npz", image=img, keypoints=kp,
                 visible=np.ones(21, bool))
    return str(d)


def _run(samples, out, extra):
    CLI.main([samples, "--model-type", "hand", "--out", out,
              "--epochs", "1", "--batch", "4", "--size", "48",
              "--seed", "3"] + extra)
    return W.load(out, "hand")


def test_single_device_trains_and_saves(hand_samples, tmp_path):
    params = _run(hand_samples, str(tmp_path / "w.npz"), [])
    flat = W.to_flat_dict(params)
    assert all(np.isfinite(v).all() for v in flat.values())


def test_pipeline_matches_single_device(hand_samples, tmp_path):
    p1 = _run(hand_samples, str(tmp_path / "w1.npz"), [])
    p2 = _run(hand_samples, str(tmp_path / "w2.npz"), ["--pipeline", "2"])
    f1, f2 = W.to_flat_dict(p1), W.to_flat_dict(p2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], atol=2e-5, err_msg=k)


def test_mesh_data_matches_single_device(hand_samples, tmp_path):
    p1 = _run(hand_samples, str(tmp_path / "w1.npz"), [])
    p2 = _run(hand_samples, str(tmp_path / "w2.npz"), ["--mesh-data", "4"])
    f1, f2 = W.to_flat_dict(p1), W.to_flat_dict(p2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], atol=2e-5, err_msg=k)


def test_loss_decreases_body25(tmp_path):
    rng = np.random.RandomState(1)
    d = tmp_path / "body_ds"
    d.mkdir()
    for i in range(2):
        img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        kp = rng.rand(2, 25, 2).astype(np.float32) * 40 + 4
        np.savez(d / f"s{i}.npz", image=img, keypoints=kp,
                 visible=np.ones((2, 25), bool))
    logs = []
    x, heat_t, paf_t = CLI.load_samples(str(d), 48, "body25")
    assert heat_t.shape[-1] == 26 and paf_t.shape[-1] == 52

    import jax

    from islx.models import cpm

    class A:
        model_type, epochs, batch, lr = "body25", 3, 2, 1e-3
        mesh_data, compute_dtype = 0, "f32"

    params = cpm.init_params("body25", jax.random.PRNGKey(0))
    CLI._train_flat(params, x, heat_t, paf_t, A, lambda s: logs.append(s))
    losses = [float(s.split("loss ")[1].split()[0]) for s in logs]
    assert losses[-1] < losses[0]
