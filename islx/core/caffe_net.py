"""Caffe-API emulation on JAX: ``Net`` / ``Blob`` / ``SGDSolver``.

TPU-native equivalent of the reference converter's caffe shim
(/root/reference/caffemodel2pytorch/caffemodel2pytorch.py:61-285), which
builds one torch ``nn.Module`` per prototxt layer and executes them eagerly.
Here the whole prototxt dataflow compiles into ONE XLA program per
input-shape signature:

* parameters live in a functional pytree (``net.params``), not module state;
* ``Net.forward`` is a single jitted dispatch returning every blob (the
  caffe API promises ``net.blobs`` after a forward), cached per input shape;
* ``SGDSolver.step`` is ``jax.value_and_grad`` over that same program plus a
  jitted SGD(momentum, weight-decay) update — no autograd tape, no
  per-layer ``requires_grad`` bookkeeping: caffe's ``lr_mult``/``decay_mult``
  become per-leaf multipliers inside the update.

The prototxt itself is parsed with a ~50-line protobuf-text-format reader
(no protoc round trip — the reference downloads caffe.proto and shells out
to protoc at import, caffemodel2pytorch.py:30-52). Weights load from
``.caffemodel`` (wire format, via islx.core.caffe_reader), ``.h5``, ``.npz``
or ``.pt``.

Layer registry mirrors the reference's ``modules`` dict
(caffemodel2pytorch.py:287-296: Convolution, InnerProduct, Pooling, Softmax,
ReLU, Dropout, Eltwise, LRN) plus the types the OpenPose prototxts need
(PReLU, Concat, Input) and the loss layers SGDSolver needs
(SoftmaxWithLoss, EuclideanLoss).
"""
from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

TRAIN, TEST = 0, 1


def set_mode_cpu() -> None:  # caffe API compat; device choice is jax's
    pass


def set_mode_gpu() -> None:
    pass


def set_device(device_id: int) -> None:
    pass


# ---------------------------------------------------------------------------
# protobuf text-format parsing (prototxt)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|[{}:]|[^\s{}:]+')


def _tokenize(text: str) -> List[str]:
    out = []
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        out.extend(_TOKEN.findall(line))
    return out


def _coerce(tok: str):
    if tok.startswith('"'):
        return tok[1:-1]
    if tok in ("true", "True"):
        return True
    if tok in ("false", "False"):
        return False
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok  # enum name (e.g. MAX, TRAIN)


def _parse_msg(toks: List[str], i: int) -> Tuple[Dict[str, list], int]:
    """One message body; every field is a list (repeated-by-default)."""
    msg: Dict[str, list] = {}
    n = len(toks)
    while i < n and toks[i] != "}":
        key = toks[i]
        if i + 1 < n and toks[i + 1] == ":":
            val, i = _coerce(toks[i + 2]), i + 3
        elif i + 1 < n and toks[i + 1] == "{":
            val, i = _parse_msg(toks, i + 2)
        else:  # message field without colon-less brace is malformed
            raise ValueError(f"prototxt parse error near token {i}: {key!r}")
        msg.setdefault(key, []).append(val)
    return msg, i + 1


def parse_prototxt(text: str) -> Dict[str, list]:
    msg, _ = _parse_msg(_tokenize(text) + ["}"], 0)
    return msg


def _one(msg: Dict[str, list], key: str, default=None):
    v = msg.get(key)
    return v[0] if v else default


# ---------------------------------------------------------------------------
# Blob
# ---------------------------------------------------------------------------

class _AssignmentAdapter:
    """Placeholder accepting ``blob.data[...] = x`` before a shape exists
    (mirrors the reference's Blob.AssignmentAdapter,
    caffemodel2pytorch.py:165)."""

    contents: Optional[np.ndarray] = None

    @property
    def shape(self):
        return None if self.contents is None else self.contents.shape

    def __setitem__(self, idx, values):
        self.contents = np.asarray(values)


class Blob:
    """NCHW-semantics view over a (possibly on-device) array."""

    def __init__(self, data=None, diff=None):
        self.data_ = data if data is not None else _AssignmentAdapter()
        self.diff_ = diff if diff is not None else _AssignmentAdapter()
        self.shape_: Optional[Tuple[int, ...]] = None

    def reshape(self, *args):
        self.shape_ = tuple(args)

    def count(self, *axis):
        import functools
        import operator

        sl = slice(*(list(axis) + [None])[:2]) if axis else slice(None)
        return functools.reduce(operator.mul, self.shape[sl], 1)

    @property
    def data(self):
        if isinstance(self.data_, jax.Array):
            self.data_ = np.asarray(self.data_)  # lazy device fetch
        return self.data_

    @property
    def diff(self):
        if isinstance(self.diff_, jax.Array):
            self.diff_ = np.asarray(self.diff_)
        return self.diff_

    @property
    def shape(self):
        return self.shape_ if self.shape_ is not None else self.data_.shape

    @property
    def num(self):
        return self.shape[0]

    @property
    def channels(self):
        return self.shape[1]

    @property
    def height(self):
        return self.shape[2]

    @property
    def width(self):
        return self.shape[3]


# ---------------------------------------------------------------------------
# Layer registry: type -> (init(rng, in_shapes, spec) -> params|None,
#                          apply(params, inputs, spec) -> outputs tuple)
# All tensors NCHW (caffe blob layout); weights OIHW / [O, I] exactly as the
# .caffemodel stores them, so loaded blobs need no transposition.
# ---------------------------------------------------------------------------

def _ints(param, key, default):
    v = param.get(key)
    if not v:
        return (default, default)
    return (v[0], v[0]) if len(v) == 1 else (v[0], v[1])


def _filler_std(param, fan_in):
    f = _one(param, "weight_filler", {})
    t = _one(f, "type", "gaussian") if f else "gaussian"
    if t == "xavier":
        return float(np.sqrt(1.0 / max(fan_in, 1)))
    if t == "msra":
        return float(np.sqrt(2.0 / max(fan_in, 1)))
    return float(_one(f, "std", 0.01)) if f else 0.01


def _conv_init(rng, in_shapes, spec):
    p = spec.param
    cout = _one(p, "num_output")
    kh, kw = _ints(p, "kernel_size", 1)
    g = _one(p, "group", 1)
    cin = in_shapes[0][1] // g  # caffe stores grouped weights as [O, I/g, kh, kw]
    std = _filler_std(p, cin * kh * kw)
    k1, _ = jax.random.split(rng)
    w = jax.random.normal(k1, (cout, cin, kh, kw), jnp.float32) * std
    return {"weight": w, "bias": jnp.zeros((cout,), jnp.float32)}


def _conv_apply(params, inputs, spec):
    p = spec.param
    sh, sw = _ints(p, "stride", 1)
    ph, pw = _ints(p, "pad", 0)
    dh, dw = _ints(p, "dilation", 1)
    y = jax.lax.conv_general_dilated(
        inputs[0], params["weight"], window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)], rhs_dilation=(dh, dw),
        feature_group_count=_one(p, "group", 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in params:
        y = y + params["bias"][None, :, None, None]
    return (y,)


def _ip_init(rng, in_shapes, spec):
    cout = _one(spec.param, "num_output")
    cin = int(np.prod(in_shapes[0][1:]))
    std = _filler_std(spec.param, cin)
    k1, _ = jax.random.split(rng)
    w = jax.random.normal(k1, (cout, cin), jnp.float32) * std
    return {"weight": w, "bias": jnp.zeros((cout,), jnp.float32)}


def _ip_apply(params, inputs, spec):
    x = inputs[0].reshape(inputs[0].shape[0], -1)
    return (x @ params["weight"].T + params["bias"],)


def _pool_apply(params, inputs, spec):
    p = spec.param
    kh, kw = _ints(p, "kernel_size", 1)
    sh, sw = _ints(p, "stride", 1)
    ph, pw = _ints(p, "pad", 0)
    x = inputs[0]
    h, w = x.shape[2], x.shape[3]
    # caffe sizes pooling with CEIL: out = ceil((H + 2p - k)/s) + 1,
    # then clips the last window to start inside the image+pad (PoolingLayer
    # ::Reshape: if ((pooled-1)*stride >= height + pad) --pooled) — torch's
    # ceil_mode=True applies the same rule
    oh = -(-(h + 2 * ph - kh) // sh) + 1
    ow = -(-(w + 2 * pw - kw) // sw) + 1
    if ph and (oh - 1) * sh >= h + ph:
        oh -= 1
    if pw and (ow - 1) * sw >= w + pw:
        ow -= 1
    eh = (oh - 1) * sh + kh - (h + 2 * ph)  # extra bottom pad for ceil
    ew = (ow - 1) * sw + kw - (w + 2 * pw)
    mode = _one(p, "pool", "MAX")
    is_max = mode in ("MAX", 0)
    pad = [(0, 0), (0, 0), (ph, ph + max(eh, 0)), (pw, pw + max(ew, 0))]
    if is_max:
        y = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, kh, kw), (1, 1, sh, sw),
            [(lo, hi) for lo, hi in pad])
    else:
        y = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, kh, kw), (1, 1, sh, sw),
            [(lo, hi) for lo, hi in pad]) / float(kh * kw)
    return (y,)


def _relu_apply(params, inputs, spec):
    slope = _one(spec.param, "negative_slope", 0.0)
    x = inputs[0]
    return (jnp.where(x > 0, x, slope * x) if slope else jnp.maximum(x, 0),)


def _prelu_init(rng, in_shapes, spec):
    c = in_shapes[0][1]
    return {"weight": jnp.full((c,), 0.25, jnp.float32)}


def _prelu_apply(params, inputs, spec):
    x = inputs[0]
    a = params["weight"][None, :, None, None] if x.ndim == 4 \
        else params["weight"]
    return (jnp.where(x >= 0, x, a * x),)


def _softmax_apply(params, inputs, spec):
    return (jax.nn.softmax(inputs[0], axis=_one(spec.param, "axis", 1)),)


def _dropout_apply(params, inputs, spec):
    # inference shim: identity (caffe TEST phase). SGDSolver trains without
    # stochastic dropout — same scope cut as exactness of the reference shim
    # only matters under TEST (its demos never train through Dropout).
    return (inputs[0],)


def _eltwise_apply(params, inputs, spec):
    op = _one(spec.param, "operation", "SUM")
    if op in ("PROD", 0):
        out = inputs[0]
        for x in inputs[1:]:
            out = out * x
        return (out,)
    if op in ("MAX", 2):
        out = inputs[0]
        for x in inputs[1:]:
            out = jnp.maximum(out, x)
        return (out,)
    coeffs = spec.param.get("coeff") or [1.0] * len(inputs)
    out = coeffs[0] * inputs[0]
    for c, x in zip(coeffs[1:], inputs[1:]):
        out = out + c * x
    return (out,)


def _lrn_apply(params, inputs, spec):
    p = spec.param
    size = _one(p, "local_size", 5)
    alpha, beta = _one(p, "alpha", 1.0), _one(p, "beta", 0.75)
    k = _one(p, "k", 1.0)
    x = inputs[0]
    half = size // 2
    sq = jnp.pad(x * x, [(0, 0), (half, half), (0, 0), (0, 0)])
    acc = jax.lax.reduce_window(sq, 0.0, jax.lax.add, (1, size, 1, 1),
                                (1, 1, 1, 1), "VALID")
    return (x / (k + (alpha / size) * acc) ** beta,)


def _concat_apply(params, inputs, spec):
    return (jnp.concatenate(inputs, axis=_one(spec.param, "axis", 1)),)


def _softmax_loss_apply(params, inputs, spec):
    """SoftmaxWithLoss: softmax over channel axis 1, NLL averaged over the
    batch AND every spatial position (caffe's normalize=true default; for
    [N,C,H,W] scores with [N,H,W] per-pixel labels this is the dense
    segmentation/heatmap loss, == torch F.cross_entropy 'mean')."""
    scores, labels = inputs[0], inputs[1]
    n, c = scores.shape[0], scores.shape[1]
    logp = jax.nn.log_softmax(scores, axis=1).reshape(n, c, -1)   # [N,C,S]
    lbl = labels.astype(jnp.int32).reshape(n, -1)                 # [N,S]
    nll = -jnp.take_along_axis(logp, lbl[:, None, :], axis=1)[:, 0, :]
    return (jnp.mean(nll),)


def _euclidean_loss_apply(params, inputs, spec):
    a, b = inputs[0], inputs[1]
    return (jnp.sum((a - b) ** 2) / (2.0 * a.shape[0]),)


_REGISTRY: Dict[str, Tuple[Optional[Callable], Callable]] = {
    "Convolution": (_conv_init, _conv_apply),
    "InnerProduct": (_ip_init, _ip_apply),
    "Pooling": (None, _pool_apply),
    "ReLU": (None, _relu_apply),
    "PReLU": (_prelu_init, _prelu_apply),
    "Softmax": (None, _softmax_apply),
    "Dropout": (None, _dropout_apply),
    "Eltwise": (None, _eltwise_apply),
    "LRN": (None, _lrn_apply),
    "Concat": (None, _concat_apply),
    "SoftmaxWithLoss": (None, _softmax_loss_apply),
    "EuclideanLoss": (None, _euclidean_loss_apply),
}


class _LayerSpec:
    def __init__(self, msg: Dict[str, list]):
        self.name: str = _one(msg, "name", "")
        t = _one(msg, "type", "")
        self.type: str = t if isinstance(t, str) else str(t)
        self.bottom: List[str] = list(msg.get("bottom", []))
        self.top: List[str] = list(msg.get("top", []))
        self.param: Dict[str, list] = next(
            (v[0] for k, v in msg.items() if k.endswith("_param") and v), {})
        self.opt_params: List[Dict[str, list]] = list(msg.get("param", []))
        lw = msg.get("loss_weight")
        default_lw = 1.0 if self.type.upper().endswith("LOSS") else 0.0
        self.loss_weight: List[float] = (
            [float(x) for x in lw] if lw else [default_lw] * len(self.top))
        phases = [_one(r, "phase") for r in msg.get("include", [])]
        self.phase: Optional[int] = (
            {"TRAIN": TRAIN, "TEST": TEST}.get(phases[0]) if phases else None)


class Net:
    """Functional caffe net: prototxt dataflow -> one jitted XLA program.

    ``Net(prototxt, weights=None, phase=None)`` — both caffe constructor
    forms accepted positionally like the reference shim
    (caffemodel2pytorch.py:62-69). ``forward(data=..., **variables)``
    returns {output_blob: np.ndarray} and fills ``net.blobs``.
    """

    def __init__(self, prototxt: str, *args, **kwargs):
        kwargs.pop("caffe_proto", None)  # compat; no protoc needed here
        weights = kwargs.pop("weights", None) or (tuple(args) + (None,))[0]
        phase = kwargs.pop("phase", None)
        if phase is None and len(args) > 1:
            phase = args[1]
        self.phase = TEST if phase is None else phase

        with open(prototxt) as f:
            self.net_param = parse_prototxt(f.read())

        self.layers: List[_LayerSpec] = []
        for msg in self.net_param.get("layer", []):
            spec = _LayerSpec(msg)
            if spec.phase is not None and spec.phase != self.phase:
                continue
            if spec.type in ("Input", "Data"):
                continue  # data enters through forward() kwargs
            if spec.type not in _REGISTRY:
                print(f"caffe_net: skipping layer [{spec.name}, {spec.type}]"
                      ": not in registry")
                continue
            self.layers.append(spec)

        # legacy "input:"/"input_dim:" header (used by the OpenPose
        # deploy prototxts) → remembered only for shape-less init
        self.input_names = list(self.net_param.get("input", []))
        self.params: Dict[str, Dict[str, jax.Array]] = {}
        self.blobs: Dict[str, Blob] = {}
        self.blob_loss_weights: Dict[str, float] = {
            t: w for spec in self.layers
            for t, w in zip(spec.top, spec.loss_weight)}
        self._jit_cache: Dict[tuple, Callable] = {}
        if weights is not None:
            self.copy_from(weights)

    # -- parameter init / loading -----------------------------------------

    def _ensure_params(self, variables: Dict[str, np.ndarray],
                       rng: Optional[jax.Array] = None) -> None:
        """Lazy shape-dependent init (the reference's lazy Convolution /
        InnerProduct modules, caffemodel2pytorch.py:320-354): layers missing
        from ``self.params`` get fresh filler-initialised values the first
        time input shapes are known."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        shapes = {k: tuple(np.shape(v)) for k, v in variables.items()}
        for spec in self.layers:
            init, apply = _REGISTRY[spec.type]
            in_shapes = [shapes[b] for b in spec.bottom]
            if init is not None and spec.name not in self.params:
                rng, sub = jax.random.split(rng)
                self.params[spec.name] = init(sub, in_shapes, spec)
            # propagate shapes with zero-cost abstract eval
            outs = jax.eval_shape(
                lambda p, xs, s=spec, a=apply: a(p, xs, s),
                self.params.get(spec.name),
                [jax.ShapeDtypeStruct(s, jnp.float32) for s in in_shapes])
            outs = outs if isinstance(outs, tuple) else (outs,)
            for t, o in zip(spec.top, outs):
                shapes[t] = o.shape

    def copy_from(self, weights: str) -> None:
        flat: Dict[str, np.ndarray] = {}
        if weights.endswith(".caffemodel"):
            from islx.core.caffe_reader import read_caffemodel

            flat = read_caffemodel(weights)
        elif weights.endswith((".h5", ".hdf5")):
            import h5py

            with h5py.File(weights, "r") as h:
                flat = {k: np.array(v) for k, v in h.items()}
        elif weights.endswith(".npz"):
            flat = dict(np.load(weights))
        else:
            import torch

            sd = torch.load(weights, map_location="cpu", weights_only=False)
            flat = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                    for k, v in sd.items()}
        for spec in self.layers:
            entry = {}
            for part in ("weight", "bias"):
                v = flat.get(f"{spec.name}.{part}")
                if v is not None:
                    entry[part] = jnp.asarray(np.asarray(v, np.float32))
            if entry:
                self.params[spec.name] = entry

    def save(self, weights: str) -> None:
        import h5py

        with h5py.File(weights, "w") as h:
            for name, entry in self.params.items():
                for part, v in entry.items():
                    h[f"{name}.{part}"] = np.asarray(v)

    # -- execution ---------------------------------------------------------

    def _run(self, params, variables, train: bool):
        variables = dict(variables)
        for spec in self.layers:
            _, apply = _REGISTRY[spec.type]
            inputs = [variables[b] for b in spec.bottom]
            outs = apply(params.get(spec.name), inputs, spec)
            variables.update(zip(spec.top, outs))
        return variables

    def _output_names(self) -> set:
        tops = {t for s in self.layers for t in s.top}
        consumed = {b for s in self.layers for b in s.bottom
                    if b not in s.top}  # in-place tops stay outputs
        return tops - consumed

    def forward(self, data=None, **variables) -> Dict[str, np.ndarray]:
        if data is not None:
            variables["data"] = data
        variables = {k: jnp.asarray(np.asarray(v, np.float32))
                     for k, v in variables.items()}
        self._ensure_params(variables)
        key = tuple(sorted((k, v.shape) for k, v in variables.items()))
        fn = self._jit_cache.get(key)
        if fn is None:
            train = self.phase == TRAIN
            fn = jax.jit(lambda p, v: self._run(p, v, train))
            self._jit_cache[key] = fn
        out = fn(self.params, variables)
        self.blobs.update({k: Blob(data=v) for k, v in out.items()})
        outputs = self._output_names()
        return {k: np.asarray(v) for k, v in out.items() if k in outputs}

    __call__ = forward


# ---------------------------------------------------------------------------
# SGDSolver
# ---------------------------------------------------------------------------

class SGDSolver:
    """caffe solver prototxt -> jitted SGD(momentum, weight decay) on the
    Net program (reference: caffemodel2pytorch.py:238-285, which drives
    torch.optim.SGD through autograd; here the loss/grad is one
    ``jax.value_and_grad`` program and the update one fused XLA step)."""

    def __init__(self, solver_prototxt: str):
        with open(solver_prototxt) as f:
            sp = parse_prototxt(f.read())
        self.net = Net(_one(sp, "train_net") or _one(sp, "net"), phase=TRAIN)
        self.iter = 1
        self.iter_size = int(_one(sp, "iter_size", 1))
        self.base_lr = float(_one(sp, "base_lr", 0.01)) / self.iter_size
        self.momentum = float(_one(sp, "momentum", 0.0))
        self.weight_decay = float(_one(sp, "weight_decay", 0.0))
        self.lr_policy = _one(sp, "lr_policy", "fixed")
        self.step_size = int(_one(sp, "stepsize", 0) or 0)
        self.gamma = float(_one(sp, "gamma", 1.0))
        self._velocity = None
        self._update = None

    def _lr(self) -> float:
        if self.lr_policy == "step" and self.step_size:
            return self.base_lr * self.gamma ** (self.iter // self.step_size)
        return self.base_lr

    def _multipliers(self):
        """(lr_mult, decay_mult) per param leaf from the layer's repeated
        ``param {}`` entries; lr_mult==0 freezes the leaf (requires_grad
        semantics of the reference shim, caffemodel2pytorch.py:98-99)."""
        lr_m, wd_m = {}, {}
        for spec in self.net.layers:
            entry = self.net.params.get(spec.name)
            if not entry:
                continue
            lr_m[spec.name], wd_m[spec.name] = {}, {}
            # caffe's repeated ``param {}`` entries apply to blobs in blob
            # order: weight first, then bias
            order = [p for p in ("weight", "bias") if p in entry]
            order += [p for p in entry if p not in order]
            for part, opt in zip(order, (list(spec.opt_params) + [{}, {}])):
                lr_m[spec.name][part] = float(_one(opt, "lr_mult", 1))
                wd_m[spec.name][part] = float(_one(opt, "decay_mult", 1))
        return lr_m, wd_m

    def _build_update(self):
        """One jitted (params, vel, lr, variables) -> (loss, params, vel)
        program, built ONCE: the training batch is a traced argument, so
        repeated step() calls reuse the compiled executable (a new batch
        shape retraces via jit's own signature cache, not a rebuild)."""
        net = self.net
        lw = net.blob_loss_weights
        loss_tops = [t for t, w in lw.items() if w]
        lr_m, wd_m = self._multipliers()
        momentum, weight_decay = self.momentum, self.weight_decay

        def update(params, vel, lr, variables):
            def loss_fn(params):
                out = net._run(params, variables, True)
                return sum(lw[t] * jnp.sum(out[t]) for t in loss_tops)

            loss, grads = jax.value_and_grad(loss_fn)(params)

            def upd(p, g, v, lm, dm):
                g = g + weight_decay * dm * p
                v = momentum * v + lr * lm * g
                return p - v, v

            new_p, new_v = {}, {}
            for name, entry in params.items():
                new_p[name], new_v[name] = {}, {}
                for part, p in entry.items():
                    lm = lr_m.get(name, {}).get(part, 1.0)
                    if lm == 0.0:
                        new_p[name][part], new_v[name][part] = p, vel[name][part]
                        continue
                    q, v = upd(p, grads[name][part], vel[name][part],
                               lm, wd_m.get(name, {}).get(part, 1.0))
                    new_p[name][part], new_v[name][part] = q, v
            return loss, new_p, new_v

        return jax.jit(update)

    def step(self, iterations: int = 1, **inputs) -> float:
        net = self.net
        variables = {k: jnp.asarray(np.asarray(v, np.float32))
                     for k, v in inputs.items()}
        net._ensure_params(variables)
        if self._velocity is None:
            self._velocity = jax.tree.map(jnp.zeros_like, net.params)
        if self._update is None:
            self._update = self._build_update()

        total = 0.0
        for _ in range(iterations):
            loss = 0.0
            for _ in range(self.iter_size):
                l, net.params, self._velocity = self._update(
                    net.params, self._velocity, self._lr(), variables)
                loss += float(l) / self.iter_size
            total += loss
            self.iter += 1
        return total
