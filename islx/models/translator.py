"""ISL translation head: masked BiLSTM classifier over 167 expressions.

Same architecture as the reference's keras head (demo_isl_translate.py:72-100):

    Input[20,156] -> Masking(0.) -> BatchNorm -> BiLSTM(32, seq) -> Dropout
    -> BiLSTM(32) -> ELU -> Dense32(no bias) -> BN -> Dropout -> ELU
    -> Dense32(no bias) -> BN -> ELU -> Dropout -> Dense(167, softmax)

TPU-native design: the LSTMs run as ``jax.lax.scan`` over time with keras
masking semantics (masked steps carry state AND output forward), parameters
are a flat pytree with keras-compatible layout (kernel [F,4U] / recurrent
[U,4U] / bias [4U], gate order i,f,c,o) so keras-trained weights import as a
pure reshape, and the whole forward is one jittable, vmappable, differentiable
function — the reference could only train this head in an external notebook;
here :mod:`islx.isl.train` trains it data-parallel over a device mesh.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from islx.core.config import TranslatorConfig

Params = Dict[str, Dict[str, jax.Array]]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _lstm_init(key, in_dim: int, units: int) -> Dict[str, jax.Array]:
    k1, k2 = jax.random.split(key)
    # glorot_uniform kernel + orthogonal recurrent (keras defaults)
    lim = np.sqrt(6.0 / (in_dim + 4 * units))
    kernel = jax.random.uniform(k1, (in_dim, 4 * units), jnp.float32, -lim, lim)
    rec = jnp.concatenate(
        [jnp.linalg.qr(jax.random.normal(k, (units, units)))[0]
         for k in jax.random.split(k2, 4)], axis=1)
    bias = jnp.zeros((4 * units,)).at[units:2 * units].set(1.0)  # unit_forget
    return {"kernel": kernel, "recurrent": rec, "bias": bias}


def _bn_init(dim: int) -> Dict[str, jax.Array]:
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,)),
            "mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}


def _dense_init(key, in_dim: int, out_dim: int, bias: bool,
                he: bool) -> Dict[str, jax.Array]:
    if he:
        w = jax.random.normal(key, (in_dim, out_dim)) * np.sqrt(2.0 / in_dim)
    else:
        lim = np.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -lim, lim)
    p = {"kernel": w}
    if bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def init_params(cfg: TranslatorConfig = TranslatorConfig(),
                key: Optional[jax.Array] = None) -> Params:
    if key is None:
        key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    u, f = cfg.lstm_units, cfg.feature_dim
    return {
        "bn0": _bn_init(f),
        "lstm1_fwd": _lstm_init(ks[0], f, u),
        "lstm1_bwd": _lstm_init(ks[1], f, u),
        "lstm2_fwd": _lstm_init(ks[2], 2 * u, u),
        "lstm2_bwd": _lstm_init(ks[3], 2 * u, u),
        "dense1": _dense_init(ks[4], 2 * u, cfg.dense_units, False, True),
        "bn1": _bn_init(cfg.dense_units),
        "dense2": _dense_init(ks[5], cfg.dense_units, cfg.dense_units, False, True),
        "bn2": _bn_init(cfg.dense_units),
        "dense3": _dense_init(ks[6], cfg.dense_units, cfg.n_classes, True, False),
    }


def param_count(params: Params) -> int:
    return sum(int(np.prod(v.shape)) for d in params.values() for v in d.values())


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _lstm_scan(p: Dict[str, jax.Array], xs: jax.Array, mask: jax.Array,
               reverse: bool) -> Tuple[jax.Array, jax.Array]:
    """Masked LSTM over time. xs [B,T,F], mask [B,T] bool.

    Keras masking semantics: masked steps pass (h, c, output) through
    unchanged. Returns (outputs [B,T,U], last_output [B,U]).
    """
    units = p["recurrent"].shape[0]
    b = xs.shape[0]
    # precompute input projections for all timesteps in one big matmul (MXU)
    zx = jnp.einsum("btf,fg->btg", xs, p["kernel"]) + p["bias"]

    def step(carry, inp):
        h, c, out_prev = carry
        z_t, m_t = inp
        z = z_t + h @ p["recurrent"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c_new = f * c + i * jnp.tanh(g)
        h_new = o * jnp.tanh(c_new)
        m = m_t[:, None]
        h_new = jnp.where(m, h_new, h)
        c_new = jnp.where(m, c_new, c)
        out = jnp.where(m, h_new, out_prev)
        return (h_new, c_new, out), out

    zeros = jnp.zeros((b, units), xs.dtype)
    init = (zeros, zeros, zeros)
    zx_t = jnp.swapaxes(zx, 0, 1)           # [T,B,4U]
    mask_t = jnp.swapaxes(mask, 0, 1)       # [T,B]
    (_, _, last), outs = jax.lax.scan(step, init, (zx_t, mask_t),
                                      reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), last


def _bilstm(p_fwd, p_bwd, xs, mask, return_sequences: bool) -> jax.Array:
    out_f, last_f = _lstm_scan(p_fwd, xs, mask, reverse=False)
    out_b, last_b = _lstm_scan(p_bwd, xs, mask, reverse=True)
    if return_sequences:
        return jnp.concatenate([out_f, out_b], axis=-1)
    return jnp.concatenate([last_f, last_b], axis=-1)


def _bn(p, x, train: bool, eps: float = 1e-3):
    """keras BatchNormalization (momentum handled by the training loop)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = x.mean(axes)
        var = x.var(axes)
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * p["gamma"] + p["beta"]


def _dropout(x, rate, rng, train):
    if not train or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def forward(params: Params, x: jax.Array, train: bool = False,
            rng: Optional[jax.Array] = None,
            cfg: TranslatorConfig = TranslatorConfig()) -> jax.Array:
    """x [B,T,156] float -> class probabilities [B,167].

    Masking (keras Masking(mask_value=0.)): a timestep is masked when every
    feature equals 0 (zero-padded window tail, reference
    src/ISL_Model_parameter.py:344-346).
    """
    x = x.astype(jnp.float32)
    mask = jnp.any(x != 0.0, axis=-1)        # [B,T]
    rngs = (jax.random.split(rng, 3) if rng is not None else (None,) * 3)

    h = _bn(params["bn0"], x, train)
    h = _bilstm(params["lstm1_fwd"], params["lstm1_bwd"], h, mask, True)
    h = _dropout(h, cfg.dropout, rngs[0], train)
    h = _bilstm(params["lstm2_fwd"], params["lstm2_bwd"], h, mask, False)
    h = jax.nn.elu(h)
    h = h @ params["dense1"]["kernel"]
    h = _bn(params["bn1"], h, train)
    h = _dropout(h, cfg.dropout, rngs[1], train)
    h = jax.nn.elu(h)
    h = h @ params["dense2"]["kernel"]
    h = _bn(params["bn2"], h, train)
    h = jax.nn.elu(h)
    h = _dropout(h, cfg.dropout, rngs[2], train)
    logits = h @ params["dense3"]["kernel"] + params["dense3"]["bias"]
    return jax.nn.softmax(logits, axis=-1)


def batch_stats(params: Params, x: jax.Array,
                cfg: TranslatorConfig = TranslatorConfig()) -> dict:
    """Batch mean/var at every BatchNorm input under train-mode forward —
    used by the training loop to EMA-update ALL running statistics so
    inference normalizes consistently with training."""
    x = x.astype(jnp.float32)
    mask = jnp.any(x != 0.0, axis=-1)
    stats = {"bn0": (x.mean((0, 1)), x.var((0, 1)))}
    h = _bn(params["bn0"], x, train=True)
    h = _bilstm(params["lstm1_fwd"], params["lstm1_bwd"], h, mask, True)
    h = _bilstm(params["lstm2_fwd"], params["lstm2_bwd"], h, mask, False)
    h = jax.nn.elu(h)
    h = h @ params["dense1"]["kernel"]
    stats["bn1"] = (h.mean(0), h.var(0))
    h = _bn(params["bn1"], h, train=True)
    h = jax.nn.elu(h)
    h = h @ params["dense2"]["kernel"]
    stats["bn2"] = (h.mean(0), h.var(0))
    return stats


# ---------------------------------------------------------------------------
# keras import
# ---------------------------------------------------------------------------

# Weighted layers of the reference head in order (Masking/Dropout/Activation
# carry no weights): bn0, bilstm1, bilstm2, dense1, bn1, dense2, bn2, dense3.
_LAYER_ORDER = ["bn0", ("lstm1_fwd", "lstm1_bwd"), ("lstm2_fwd", "lstm2_bwd"),
                "dense1", "bn1", "dense2", "bn2", "dense3"]


def build_keras_head(cfg: Optional[TranslatorConfig] = None,
                     name: str = "islx_head"):
    """The reference's exact keras head graph (demo_isl_translate.py:72-100)
    — for exporting islx-trained weights into the reference's stack and for
    the one-model artifact (islx.models.one_model)."""
    import keras
    from keras.layers import (LSTM, Activation, BatchNormalization,
                              Bidirectional, Dense, Dropout, Input, Masking)

    cfg = cfg or TranslatorConfig()
    m = keras.Sequential(name=name)
    m.add(Input(shape=(cfg.window_size, cfg.feature_dim)))
    m.add(Masking(mask_value=0.0))
    m.add(BatchNormalization())
    m.add(Bidirectional(LSTM(cfg.lstm_units, recurrent_dropout=0.2,
                             return_sequences=True)))
    m.add(Dropout(0.2))
    m.add(Bidirectional(LSTM(cfg.lstm_units, recurrent_dropout=0.2)))
    m.add(Activation("elu"))
    m.add(Dense(cfg.dense_units, use_bias=False,
                kernel_initializer="he_normal"))
    m.add(BatchNormalization())
    m.add(Dropout(0.2))
    m.add(Activation("elu"))
    m.add(Dense(cfg.dense_units, use_bias=False,
                kernel_initializer="he_normal"))
    m.add(BatchNormalization())
    m.add(Activation("elu"))
    m.add(Dropout(0.2))
    m.add(Dense(cfg.n_classes, activation="softmax"))
    return m


def from_keras_weights(weight_lists: list) -> Params:
    """Build params from keras get_weights() lists, one per weighted layer in
    model order. BN = [gamma, beta, mean, var]; Bidirectional LSTM =
    [fwd_kernel, fwd_recurrent, fwd_bias, bwd_kernel, bwd_recurrent,
    bwd_bias]; Dense = [kernel(, bias)].
    """
    params: Params = {}
    for ours, ws in zip(_LAYER_ORDER, weight_lists):
        ws = [np.asarray(w) for w in ws]
        if isinstance(ours, tuple):           # bidirectional LSTM
            fwd, bwd = ours
            params[fwd] = {"kernel": jnp.asarray(ws[0]),
                           "recurrent": jnp.asarray(ws[1]),
                           "bias": jnp.asarray(ws[2])}
            params[bwd] = {"kernel": jnp.asarray(ws[3]),
                           "recurrent": jnp.asarray(ws[4]),
                           "bias": jnp.asarray(ws[5])}
        elif ours.startswith("bn"):
            params[ours] = {"gamma": jnp.asarray(ws[0]),
                            "beta": jnp.asarray(ws[1]),
                            "mean": jnp.asarray(ws[2]),
                            "var": jnp.asarray(ws[3])}
        else:
            entry = {"kernel": jnp.asarray(ws[0])}
            if len(ws) > 1:
                entry["bias"] = jnp.asarray(ws[1])
            params[ours] = entry
    return params


def load_keras(path: str) -> Params:
    """Load a reference-trained ``.keras``/``.h5`` head checkpoint
    (reference: demo_isl_translate.py:100)."""
    import keras

    model = keras.models.load_model(path, compile=False)
    weight_lists = [layer.get_weights() for layer in model.layers
                    if layer.get_weights()]
    return from_keras_weights(weight_lists)


def to_keras_weights(params: Params) -> list:
    """Inverse of :func:`from_keras_weights`: per-layer get_weights() lists
    (lets an islx-trained head run in the reference's keras stack — the
    counterpart of reference model_converter.py)."""
    out = []
    for ours in _LAYER_ORDER:
        if isinstance(ours, tuple):
            fwd, bwd = ours
            out.append([np.asarray(params[fwd]["kernel"]),
                        np.asarray(params[fwd]["recurrent"]),
                        np.asarray(params[fwd]["bias"]),
                        np.asarray(params[bwd]["kernel"]),
                        np.asarray(params[bwd]["recurrent"]),
                        np.asarray(params[bwd]["bias"])])
        elif ours.startswith("bn"):
            p = params[ours]
            out.append([np.asarray(p["gamma"]), np.asarray(p["beta"]),
                        np.asarray(p["mean"]), np.asarray(p["var"])])
        else:
            p = params[ours]
            ws = [np.asarray(p["kernel"])]
            if "bias" in p:
                ws.append(np.asarray(p["bias"]))
            out.append(ws)
    return out


def save_npz(path: str, params: Params) -> None:
    """islx-native head checkpoint."""
    flat = {f"{name}/{k}": np.asarray(v)
            for name, entry in params.items() for k, v in entry.items()}
    np.savez(path, **flat)


def load_npz(path: str) -> Params:
    data = np.load(path)
    params: Params = {}
    for key in data.files:
        name, k = key.split("/")
        params.setdefault(name, {})[k] = jnp.asarray(data[key])
    return params
