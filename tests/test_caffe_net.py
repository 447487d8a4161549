"""Caffe-API emulation layer (islx.core.caffe_net) — the reference's
Net/Blob/SGDSolver shim (caffemodel2pytorch.py:61-285) rebuilt on JAX.

Oracle: hand-computed numpy for each layer type; torch for conv parity when
available; the wire-format writer from test_components for .caffemodel
loading.
"""
import numpy as np
import pytest

from islx.core import caffe_net as C


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


NET_PROTOTXT = """
name: "tiny"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
layer {
  name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 1 }
}
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer {
  name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 }
}
layer {
  name: "fc" type: "InnerProduct" bottom: "pool1" top: "fc"
  inner_product_param { num_output: 5 }
}
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""


class TestPrototxtParser:
    def test_scalars_messages_repeated(self):
        msg = C.parse_prototxt(
            'name: "n"  # comment\n'
            'input_dim: 1 input_dim: 3\n'
            'layer { name: "a" flag: true x: 1.5 }\n'
            'layer { name: "b" pool: MAX }')
        assert msg["name"] == ["n"]
        assert msg["input_dim"] == [1, 3]
        assert len(msg["layer"]) == 2
        assert msg["layer"][0]["flag"] == [True]
        assert msg["layer"][0]["x"] == [1.5]
        assert msg["layer"][1]["pool"] == ["MAX"]


class TestNetForward:
    def test_dataflow_and_blobs(self, tmp_path, rng):
        net = C.Net(_write(tmp_path, "net.prototxt", NET_PROTOTXT))
        x = rng.randn(1, 3, 8, 8).astype(np.float32)
        out = net.forward(data=x)
        # only the terminal blob is an output (conv1 is consumed; in-place
        # relu keeps conv1 a non-output) — reference semantics
        # caffemodel2pytorch.py:131-132
        assert set(out) == {"prob"}
        assert out["prob"].shape == (1, 5)
        np.testing.assert_allclose(out["prob"].sum(), 1.0, rtol=1e-5)
        # every blob is populated, NCHW accessors work
        assert net.blobs["conv1"].channels == 4
        assert net.blobs["pool1"].height == 4
        assert net.blobs["data"].data.shape == (1, 3, 8, 8)

    def test_conv_matches_torch(self, tmp_path, rng):
        torch = pytest.importorskip("torch")
        net = C.Net(_write(tmp_path, "net.prototxt", NET_PROTOTXT))
        x = rng.randn(2, 3, 8, 8).astype(np.float32)
        net.forward(data=x)
        w = np.asarray(net.params["conv1"]["weight"])
        b = np.asarray(net.params["conv1"]["bias"])
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=1)
        got = np.asarray(net.blobs["conv1"].data)
        np.testing.assert_allclose(got, np.maximum(ref.numpy(), 0),
                                   atol=1e-4)

    def test_grouped_conv_matches_torch(self, tmp_path, rng):
        # caffe group>1 (AlexNet-style): weights [O, I/g, kh, kw] ==
        # XLA feature_group_count (reference parses the same proto field,
        # caffemodel2pytorch.py:320-340)
        torch = pytest.importorskip("torch")
        proto = """
input: "data"
input_dim: 2 input_dim: 6 input_dim: 8 input_dim: 8
layer {
  name: "gconv" type: "Convolution" bottom: "data" top: "gconv"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 group: 2 }
}
"""
        net = C.Net(_write(tmp_path, "g.prototxt", proto))
        x = rng.randn(2, 6, 8, 8).astype(np.float32)
        out = net.forward(data=x)
        w = np.asarray(net.params["gconv"]["weight"])
        b = np.asarray(net.params["gconv"]["bias"])
        assert w.shape == (4, 3, 3, 3)  # I/g = 6/2
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=1, groups=2)
        np.testing.assert_allclose(out["gconv"], ref.numpy(), atol=1e-4)

    def test_pool_ceil_sizing(self, tmp_path, rng):
        # caffe CEIL pooling: 7px, k=2, s=2 -> ceil((7-2)/2)+1 = 4 (torch
        # floor mode would give 3)
        proto = """
input: "data"
layer { name: "p" type: "Pooling" bottom: "data" top: "p"
        pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
"""
        net = C.Net(_write(tmp_path, "p.prototxt", proto))
        out = net.forward(data=rng.randn(1, 2, 7, 7).astype(np.float32))
        assert out["p"].shape == (1, 2, 4, 4)

    def test_eltwise_concat_prelu(self, tmp_path, rng):
        proto = """
input: "a" input: "b"
layer { name: "s" type: "Eltwise" bottom: "a" bottom: "b" top: "s" }
layer { name: "m" type: "Eltwise" bottom: "a" bottom: "b" top: "m"
        eltwise_param { operation: MAX } }
layer { name: "c" type: "Concat" bottom: "s" bottom: "m" top: "c" }
layer { name: "pr" type: "PReLU" bottom: "c" top: "pr" }
"""
        net = C.Net(_write(tmp_path, "e.prototxt", proto))
        a = rng.randn(1, 2, 3, 3).astype(np.float32)
        b = rng.randn(1, 2, 3, 3).astype(np.float32)
        out = net.forward(a=a, b=b)
        cat = np.concatenate([a + b, np.maximum(a, b)], axis=1)
        np.testing.assert_allclose(
            out["pr"], np.where(cat >= 0, cat, 0.25 * cat), atol=1e-6)

    def test_load_save_roundtrip(self, tmp_path, rng):
        net = C.Net(_write(tmp_path, "net.prototxt", NET_PROTOTXT))
        x = rng.randn(1, 3, 8, 8).astype(np.float32)
        ref = net.forward(data=x)["prob"]
        net.save(str(tmp_path / "w.h5"))
        net2 = C.Net(str(tmp_path / "net.prototxt"),
                     weights=str(tmp_path / "w.h5"))
        np.testing.assert_allclose(net2.forward(data=x)["prob"], ref,
                                   atol=1e-6)

    def test_caffemodel_loading(self, tmp_path, rng):
        """Wire-format .caffemodel -> Net params (via islx caffe_reader)."""
        from tests.test_components import TestCaffeReader

        enc = TestCaffeReader()
        w = rng.randn(4, 3, 3, 3).astype(np.float32)
        b = rng.randn(4).astype(np.float32)

        def blob(arr):
            shape_payload = b"".join(enc._encode_varint(d) for d in arr.shape)
            blob_shape = enc._len_field(1, shape_payload)
            return (enc._len_field(7, blob_shape)
                    + enc._len_field(5, arr.astype("<f4").tobytes()))

        layer = (enc._len_field(1, b"conv1")
                 + enc._len_field(7, blob(w)) + enc._len_field(7, blob(b)))
        (tmp_path / "w.caffemodel").write_bytes(enc._len_field(100, layer))

        net = C.Net(_write(tmp_path, "net.prototxt", NET_PROTOTXT),
                    weights=str(tmp_path / "w.caffemodel"))
        np.testing.assert_array_equal(np.asarray(net.params["conv1"]["weight"]), w)
        np.testing.assert_array_equal(np.asarray(net.params["conv1"]["bias"]), b)


TRAIN_PROTOTXT = """
name: "trainable"
layer {
  name: "fc" type: "InnerProduct" bottom: "data" top: "fc"
  param { lr_mult: 1 } param { lr_mult: 2 }
  inner_product_param { num_output: 1 }
}
layer { name: "loss" type: "EuclideanLoss" bottom: "fc" bottom: "label"
        top: "loss" }
"""

FROZEN_PROTOTXT = """
layer {
  name: "fc" type: "InnerProduct" bottom: "data" top: "fc"
  param { lr_mult: 0 } param { lr_mult: 0 }
  inner_product_param { num_output: 1 }
}
layer { name: "loss" type: "EuclideanLoss" bottom: "fc" bottom: "label"
        top: "loss" }
"""


def _solver(tmp_path, net_path, **kw):
    lines = [f'net: "{net_path}"', "base_lr: 0.05", "momentum: 0.9"]
    lines += [f"{k}: {v}" for k, v in kw.items()]
    return _write(tmp_path, "solver.prototxt", "\n".join(lines))


class TestSGDSolver:
    def test_loss_decreases_on_regression(self, tmp_path, rng):
        net_path = _write(tmp_path, "train.prototxt", TRAIN_PROTOTXT)
        solver = C.SGDSolver(_solver(tmp_path, net_path))
        x = rng.randn(16, 4).astype(np.float32)
        y = (x @ np.array([[1.0], [-2.0], [0.5], [3.0]], np.float32)
             + 0.7).astype(np.float32)
        first = solver.step(1, data=x, label=y)
        solver.step(150, data=x, label=y)
        last = solver.step(1, data=x, label=y)
        assert last < first * 0.05
        assert solver.iter == 153

    def test_lr_mult_zero_freezes(self, tmp_path, rng):
        net_path = _write(tmp_path, "frozen.prototxt", FROZEN_PROTOTXT)
        solver = C.SGDSolver(_solver(tmp_path, net_path))
        x = rng.randn(8, 4).astype(np.float32)
        y = rng.randn(8, 1).astype(np.float32)
        solver.step(1, data=x, label=y)
        w0 = np.asarray(solver.net.params["fc"]["weight"]).copy()
        solver.step(3, data=x, label=y)
        np.testing.assert_array_equal(
            np.asarray(solver.net.params["fc"]["weight"]), w0)

    def test_step_lr_policy(self, tmp_path):
        net_path = _write(tmp_path, "train.prototxt", TRAIN_PROTOTXT)
        solver = C.SGDSolver(_solver(
            tmp_path, net_path, lr_policy='"step"', stepsize=10, gamma=0.1))
        assert solver._lr() == pytest.approx(0.05)
        solver.iter = 25
        assert solver._lr() == pytest.approx(0.05 * 0.01)


class TestReviewFixes:
    """Regression tests for the round-3 review findings."""

    def test_pool_pad_clamp_matches_torch(self, tmp_path, rng):
        """Padded ceil pooling clips the last window to start inside
        image+pad (caffe PoolingLayer::Reshape; torch ceil_mode=True has
        the same rule): H=5,k=2,s=2,p=1 -> 3, not ceil-only 4."""
        torch = pytest.importorskip("torch")
        proto = """
input: "data"
layer { name: "p" type: "Pooling" bottom: "data" top: "p"
        pooling_param { pool: MAX kernel_size: 2 stride: 2 pad: 1 } }
"""
        net = C.Net(_write(tmp_path, "pp.prototxt", proto))
        x = rng.randn(1, 2, 5, 5).astype(np.float32)
        out = np.asarray(net.forward(data=x)["p"])
        ref = torch.nn.MaxPool2d(2, 2, padding=1, ceil_mode=True)(
            torch.from_numpy(x)).numpy()
        assert out.shape == ref.shape == (1, 2, 3, 3)
        np.testing.assert_allclose(out, ref)

    def test_softmax_loss_spatial_matches_torch(self, tmp_path, rng):
        """SoftmaxWithLoss on [N,C,H,W] scores with [N,H,W] per-pixel
        labels averages the NLL over batch AND spatial positions
        (== torch F.cross_entropy 'mean'), not just pixel (0,0)."""
        torch = pytest.importorskip("torch")
        proto = """
input: "data"
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "data" bottom: "label"
        top: "loss" }
"""
        net = C.Net(_write(tmp_path, "sl.prototxt", proto))
        x = rng.randn(2, 3, 4, 4).astype(np.float32)
        lbl = rng.randint(0, 3, size=(2, 4, 4)).astype(np.float32)
        out = float(np.asarray(net.forward(data=x, label=lbl)["loss"]))
        ref = float(torch.nn.functional.cross_entropy(
            torch.from_numpy(x), torch.from_numpy(lbl).long()))
        assert out == pytest.approx(ref, rel=1e-5)

    def test_solver_update_program_is_reused(self, tmp_path, rng):
        """step() builds the jitted update ONCE; later calls reuse it (the
        old per-call closure retraced + recompiled the whole net every
        step with the batch baked in as a constant)."""
        net_path = _write(tmp_path, "train.prototxt", TRAIN_PROTOTXT)
        solver = C.SGDSolver(_solver(tmp_path, net_path))
        x = rng.randn(8, 4).astype(np.float32)
        y = rng.randn(8, 1).astype(np.float32)
        solver.step(1, data=x, label=y)
        u1 = solver._update
        assert u1 is not None
        solver.step(2, data=x, label=y)
        assert solver._update is u1
        # a different batch (same shapes) must change the result: the
        # inputs are traced arguments, not baked-in constants
        l_a = solver.step(1, data=x, label=y)
        l_b = solver.step(1, data=x + 1.0, label=y)
        assert l_a != l_b
