"""Int8 quantized inference (islx.models.quant): exact integer-emulation
parity, calibration mechanics, and end-to-end quantized forwards."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from islx.models import cpm, quant


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _emulate_conv_q(x, w_q, s_w, a_scale, b, pad):
    """Float64/int reference of quant.conv_q (relu-less core)."""
    x_q = np.clip(np.rint(x.astype(np.float64) * (127.0 / a_scale)),
                  -127, 127).astype(np.int64)
    k = w_q.shape[0]
    xp = np.pad(x_q, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    bsz, h, w, cin = x.shape
    cout = w_q.shape[3]
    y = np.zeros((bsz, h, w, cout), np.int64)
    for dy in range(k):
        for dx in range(k):
            patch = xp[:, dy:dy + h, dx:dx + w, :]
            y += np.einsum("bhwc,co->bhwo", patch,
                           w_q[dy, dx].astype(np.int64))
    return (y.astype(np.float64) * (s_w * (a_scale / 127.0))[None, None, None]
            + b[None, None, None])


def test_conv_q_matches_int_emulation(rng):
    bsz, h, w, cin, cout = 2, 8, 8, 16, 32
    x = rng.randn(bsz, h, w, cin).astype(np.float32)
    wt = (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)
    params = {"c": {"w": jnp.asarray(wt), "b": jnp.asarray(b)}}
    qp = quant.quantize_params(params, {"c": float(np.abs(x).max())})["c"]
    c = cpm.Conv("c", cin, cout, 3, 1, "none")
    got = np.asarray(quant.conv_q(jnp.asarray(x), qp, c))
    want = _emulate_conv_q(x, np.asarray(qp["w_q"]), np.asarray(qp["s_w"]),
                           float(qp["a_scale"]), b, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantized_layers_dispatch_through_cpm_conv(rng):
    """cpm._conv auto-detects w_q; mixed float/quant layer dicts work."""
    cin = cout = 8
    x = rng.randn(1, 6, 6, cin).astype(np.float32)
    wt = (rng.randn(3, 3, cin, cout) * 0.2).astype(np.float32)
    params = {"w": jnp.asarray(wt), "b": jnp.zeros(cout, jnp.float32)}
    c = cpm.Conv("c", cin, cout, 3, 1, "relu")
    f32 = np.asarray(cpm._conv(jnp.asarray(x), params, c))
    qp = quant.quantize_params({"c": params},
                               {"c": float(np.abs(x).max())})["c"]
    q = np.asarray(cpm._conv(jnp.asarray(x), qp, c))
    # quantization error bounded by ~1/127 per operand on smooth data
    assert np.abs(q - f32).max() < 0.15 * max(np.abs(f32).max(), 1.0)


def test_calibrate_and_full_forward(rng):
    """calibrate -> quantize -> full body25 forward: runs under jit, finite,
    close to the float forward in relative terms."""
    params = cpm.init_params("body25", jax.random.PRNGKey(0))
    x = (rng.rand(1, 24, 32, 3).astype(np.float32)) - 0.5
    scales = quant.calibrate_scales(params, "body25", [x])
    assert len(scales) == len(cpm.conv_layers("body25"))
    qparams = quant.quantize_params(params, scales)
    paf_f, heat_f = jax.jit(
        lambda p, v: cpm.body25_forward(p, v))(params, jnp.asarray(x))
    paf_q, heat_q = jax.jit(
        lambda p, v: cpm.body25_forward(p, v))(qparams, jnp.asarray(x))
    assert np.isfinite(np.asarray(heat_q)).all()
    rel = (np.linalg.norm(np.asarray(heat_q) - np.asarray(heat_f))
           / max(np.linalg.norm(np.asarray(heat_f)), 1e-6))
    assert rel < 0.35, rel   # random-weight nets amplify quant noise; the
    # implementation-exactness check is test_conv_q_matches_int_emulation


def test_calibrate_jit_matches_eager(rng):
    """The jitted calibration (one compile, default — the eager per-op
    dispatch costs ~10min on CPU for the production trunks) records the same
    per-conv scales as the eager observer path."""
    params = cpm.init_params("hand", jax.random.PRNGKey(1))
    batches = [(rng.rand(1, 16, 16, 3).astype(np.float32)) - 0.5
               for _ in range(2)]
    jit_scales = quant.calibrate_scales(params, "hand", batches)
    eager_scales = quant.calibrate_scales(params, "hand", batches,
                                          use_jit=False)
    assert set(jit_scales) == set(eager_scales)
    for name in jit_scales:
        np.testing.assert_allclose(jit_scales[name], eager_scales[name],
                                   rtol=1e-6, err_msg=name)


def test_quantized_pipeline_runs(rng):
    """Quantized params flow through FusedPosePipeline unchanged."""
    from islx.core.config import HandConfig, PoseConfig
    from islx.pipeline.batch_pose import FusedPosePipeline

    frames = (rng.rand(1, 48, 48, 3) * 255).astype(np.uint8)
    xcal = frames.astype(np.float32) / 256.0 - 0.5
    bq = quant.quantize_model(cpm.init_params("body25"), "body25", [xcal])
    hq = quant.quantize_model(cpm.init_params("hand"), "hand",
                              [np.zeros((1, 48, 48, 3), np.float32)])
    pipe = FusedPosePipeline(
        bq, hq, pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
        hand_cfg=HandConfig(scale_search=(0.25,)),
        compute_dtype=jnp.float32)
    results, boxes, peaks = pipe.assemble(pipe.device_step(frames), 1)
    assert len(results) == 1 and boxes.shape == (2, 4)


def test_quantized_params_checkpoint_roundtrip(rng, tmp_path):
    """int8 quantized params survive the checkpoint layer bit-for-bit
    (deployment artifact: calibrate once, ship the quantized pytree)."""
    from islx.core import checkpoint as C

    p = cpm.init_params("hand")
    qp = quant.quantize_model(p, "hand",
                              [np.zeros((1, 48, 48, 3), np.float32)])
    path = str(tmp_path / "q")
    C.save_pytree(path, qp)
    back = C.load_pytree(path, like=qp)
    for name, entry in qp.items():
        for k, v in entry.items():
            got = np.asarray(back[name][k])
            assert got.dtype == np.asarray(v).dtype, (name, k)
            np.testing.assert_array_equal(got, np.asarray(v))


def test_int8_resident_chain_matches_unchained(rng):
    """cpm._seq chains int8 between quantized convs (requantize fused into
    the epilogue, pools on int8). Must match running conv_q per conv on a
    float carry: identical int math, the chain only skips the intermediate
    compute-dtype round trip — exact in f32, tight in bf16."""
    layers = [
        cpm.Conv("a", 3, 8, 3, 1, "relu"),
        cpm.Conv("b", 8, 8, 3, 1, "relu"),
        cpm.Pool(2, 2),
        cpm.Conv("c", 8, 8, 3, 1, "relu"),
        cpm.Conv("d", 8, 4, 1, 0, "none"),
    ]
    x = rng.rand(2, 8, 8, 3).astype(np.float32) - 0.5
    params = {c.name: {"w": jnp.asarray((rng.randn(c.k, c.k, c.cin, c.cout)
                                         * 0.2).astype(np.float32)),
                       "b": jnp.asarray(rng.randn(c.cout).astype(np.float32))}
              for c in layers if isinstance(c, cpm.Conv)}
    # calibrate by running the float chain eagerly
    maxes = {}
    h = jnp.asarray(x)
    for layer in layers:
        if isinstance(layer, cpm.Pool):
            h = cpm._maxpool2(h)
        else:
            maxes[layer.name] = float(jnp.abs(h).max())
            h = cpm._conv(h, params[layer.name], layer, jnp.float32)
    qp = quant.quantize_params(params, maxes)

    chained = np.asarray(cpm._seq(jnp.asarray(x), layers, qp, jnp.float32))
    h = jnp.asarray(x)
    for layer in layers:
        if isinstance(layer, cpm.Pool):
            h = cpm._maxpool2(h)
        else:
            h = quant.conv_q(h, qp[layer.name], layer, jnp.float32)
    unchained = np.asarray(h)
    np.testing.assert_allclose(chained, unchained, rtol=1e-5, atol=1e-5)


def test_int8_pool_commutes_with_quantize(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    s = jnp.float32(float(jnp.abs(x).max()))
    np.testing.assert_array_equal(
        np.asarray(cpm._maxpool2(quant.quantize_act(x, s))),
        np.asarray(quant.quantize_act(cpm._maxpool2(x), s)))
