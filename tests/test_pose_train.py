"""Pose-net training: loss decreases, targets well-formed, mesh step runs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islx.models import pose_train as PT


def test_heatmap_targets(rng):
    kp = np.array([[[32.0, 16.0], [8.0, 40.0]]])
    vis = np.array([[True, False]])
    t = PT.gaussian_heatmap_targets(kp, vis, 8, 8, stride=8)
    assert t.shape == (1, 8, 8, 3)
    # nearest cell centre to (32,16) is (35.5, 19.5): exp(-24.5/98) ~ 0.78
    assert 0.7 < t[0, :, :, 0].max() <= 1.0
    assert t[0, :, :, 1].max() == 0.0          # invisible joint
    np.testing.assert_allclose(t[0, :, :, 2],
                               1 - t[0, :, :, :2].max(-1), atol=1e-6)


def test_paf_targets():
    limbs = np.array([[[[8.0, 40.0], [56.0, 40.0]]]])   # horizontal limb
    valid = np.array([[True]])
    t = PT.paf_targets(limbs, valid, 10, 10, stride=8)
    assert t.shape == (1, 10, 10, 2)
    assert t[0, 5, 4, 0] == 1.0   # on the segment: unit x
    assert t[0, 5, 4, 1] == 0.0
    assert t[0, 0, 0, 0] == 0.0   # far away


def test_hand_training_reduces_loss(rng):
    state, opt = PT.init_state("hand", key=jax.random.PRNGKey(0))
    step = PT.make_train_step(opt, "hand", compute_dtype=jnp.float32)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) - 0.5)
    target = jnp.asarray(rng.rand(2, 4, 4, 22).astype(np.float32))
    losses = []
    for _ in range(8):
        state, metrics = step(state, x, target, target)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_body25_train_step_on_mesh(rng):
    from islx.parallel import mesh as M

    mesh = M.make_mesh(n_data=4, n_model=2)
    state, opt = PT.init_state("body25", key=jax.random.PRNGKey(1))
    sharded = M.shard_cpm_params(state.params, mesh)
    state = PT.PoseTrainState(sharded, opt.init(sharded), state.step)
    step = PT.make_train_step(opt, "body25", mesh, jnp.float32)
    x = jax.device_put(jnp.asarray(rng.rand(4, 16, 16, 3), jnp.float32),
                       M.batch_sharding(mesh))
    heat_t = jax.device_put(jnp.asarray(rng.rand(4, 2, 2, 26), jnp.float32),
                            M.batch_sharding(mesh))
    paf_t = jax.device_put(jnp.asarray(rng.rand(4, 2, 2, 52), jnp.float32),
                           M.batch_sharding(mesh))
    state, metrics = step(state, x, heat_t, paf_t)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
