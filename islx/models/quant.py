"""Int8 (W8A8) quantized inference for the CPM trunks.

TPU v5e's MXU runs int8 matmuls at ~2x its bf16 rate (measured on the
dominant conv shape of the hand trunk: 289 TOP/s int8 vs 161 TFLOP/s bf16,
docs/PERFORMANCE.md). This module quantizes a CPM checkpoint so the SAME
forward functions (islx.models.cpm.FORWARDS) dispatch every conv to the
int8 MXU path:

* weights: per-output-channel symmetric int8 (`s_w[o] = max|w[..,o]|/127`);
* activations: per-tensor symmetric scales collected by running a few
  calibration batches through the float net (`calibrate_scales`), then
  quantized ON THE FLY at each conv input (activations stay bf16/f32
  between ops — no inter-layer int8 plumbing, so concatenations and pools
  need no scale algebra);
* accumulation in int32, dequantize + bias + ReLU/PReLU epilogue in f32
  exactly like the float path.

Quantized params keep the caffe-blob names and flow through the existing
pipelines untouched (`cpm._conv` auto-detects the `w_q` entry;
`cast_params` leaves int8 leaves alone). Accuracy on real checkpoints must
be validated before production use — like the hand-pyramid scale question
this is gated on downloaded weights (tools/hand_scale_eval.py pattern);
with random weights the path is still exact-int emulation-tested and
throughput-benchmarkable (`ISLX_BENCH_INT8=1 python bench.py`).
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from islx.models import cpm


def quantize_params(params: cpm.Params, a_scales: Dict[str, float],
                    skip: Iterable[str] = ()) -> cpm.Params:
    """Float params + per-layer activation scales -> quantized params.

    Every layer present in ``a_scales`` (and not in ``skip``) gets
    ``w_q`` int8 [k,k,cin,cout], ``s_w`` f32 [cout], ``a_scale`` f32 scalar;
    ``b`` (and PReLU ``p``) stay f32. Layers without a scale stay float.
    """
    skip = set(skip)
    out: cpm.Params = {}
    for name, entry in params.items():
        if name not in a_scales or name in skip:
            out[name] = dict(entry)
            continue
        w = np.asarray(entry["w"], np.float32)
        s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        s_w = np.where(s_w > 0, s_w, 1.0).astype(np.float32)
        w_q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
        q = {k: v for k, v in entry.items() if k != "w"}
        q["w_q"] = jnp.asarray(w_q)
        q["s_w"] = jnp.asarray(s_w)
        q["a_scale"] = jnp.asarray(np.float32(max(a_scales[name], 1e-8)))
        out[name] = q
    return out


def quantize_act(x: jax.Array, a_scale: jax.Array) -> jax.Array:
    """Symmetric per-tensor activation quantization to int8."""
    inv = 127.0 / a_scale.astype(jnp.float32)
    return jnp.clip(jnp.rint(x.astype(jnp.float32) * inv),
                    -127, 127).astype(jnp.int8)


def conv_q_core(x_q: jax.Array, p: Dict[str, jax.Array], c,
                compute_dtype=jnp.float32,
                out_inv: Optional[jax.Array] = None) -> jax.Array:
    """Int8 conv over ALREADY-QUANTIZED activations (int8 at p['a_scale']).

    out_inv is None  -> float output (cpm._conv epilogue semantics).
    out_inv = 127/next_a_scale -> INT8 output requantized for the next
    quantized conv in the SAME epilogue fusion. The unchained path writes
    bf16 activations and re-reads them through a separate quantize pass —
    those clamp_convert fusions measured as HALF the int8 device step
    (docs/PERFORMANCE.md round 3); chaining emits 1 byte/px once instead.
    """
    y = jax.lax.conv_general_dilated(
        x_q, p["w_q"], window_strides=(1, 1),
        padding=[(c.pad, c.pad), (c.pad, c.pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = (p["s_w"] * (p["a_scale"] / 127.0)).astype(jnp.float32)
    out = y.astype(jnp.float32) * scale + p["b"].astype(jnp.float32)
    if c.act == "relu":
        out = jnp.maximum(out, 0.0)
    elif c.act == "prelu":
        a = p["p"].astype(jnp.float32)
        out = jnp.where(out >= 0, out, a * out)
    if out_inv is not None:
        return jnp.clip(jnp.rint(out * out_inv), -127, 127).astype(jnp.int8)
    return out.astype(jnp.float32 if c.head else compute_dtype)


def conv_q(x: jax.Array, p: Dict[str, jax.Array], c,
           compute_dtype=jnp.float32) -> jax.Array:
    """Int8 conv with the float path's epilogue semantics (cpm._conv)."""
    return conv_q_core(quantize_act(x, p["a_scale"]), p, c, compute_dtype)


# ---------------------------------------------------------------------------
# Calibration: per-conv-input max|x| collected by an observer hook in
# cpm._conv. Thread-local so a live-serving calibration thread
# (islx.serve.batcher --int8-after) can never see another thread's trace.
# ---------------------------------------------------------------------------

import threading

_TLS = threading.local()


def observer():
    """The active calibration observer for THIS thread (or None)."""
    return getattr(_TLS, "observer", None)


def calibrate_scales(params: cpm.Params, model_type: str,
                     batches: Iterable[np.ndarray],
                     compute_dtype=jnp.float32,
                     percentile: Optional[float] = None,
                     use_jit: bool = True) -> Dict[str, float]:
    """Record each conv input's max|x| (or the given percentile of |x|) over
    calibration batches. batches: iterable of normalized net inputs
    [B,H,W,3] (same preprocessing as inference: x/256 - 0.5).

    use_jit=True (default) traces ONE jitted forward whose observer folds the
    per-conv maxima into the program outputs — one compile + one fast
    execution instead of a per-op eager dispatch per conv (which costs
    ~10 minutes on CPU for the two CPM trunks). use_jit=False runs eagerly;
    that observer skips tracers, so it stays safe when another thread is
    tracing a jit program concurrently (the serving swap path)."""
    fwd = cpm.FORWARDS[model_type]

    if use_jit:
        names_box: list = []

        def run(p, x):
            maxima: Dict[str, jax.Array] = {}

            def observe(name: str, v: jax.Array) -> None:
                m = (jnp.max(jnp.abs(v)) if percentile is None
                     else jnp.percentile(jnp.abs(v), percentile))
                prev = maxima.get(name)
                maxima[name] = m if prev is None else jnp.maximum(prev, m)

            _TLS.observer = observe
            try:
                fwd(p, x, compute_dtype)
            finally:
                _TLS.observer = None
            names = sorted(maxima)
            names_box[:] = names
            return jnp.stack([maxima[n] for n in names])

        run_j = jax.jit(run)
        acc = None
        for x in batches:
            vals = np.asarray(run_j(params, jnp.asarray(x, jnp.float32)),
                              np.float32)
            acc = vals if acc is None else np.maximum(acc, vals)
        return {n: float(v) for n, v in zip(names_box, acc)}

    maxima: Dict[str, jax.Array] = {}

    def observe(name: str, x: jax.Array) -> None:
        if isinstance(x, jax.core.Tracer):
            return  # a concurrent jit trace in this thread is not calibration
        # keep DEVICE scalars — one packed fetch at the end instead of a
        # ~100ms host round trip per conv per batch (CLAUDE.md transfer rule)
        v = (jnp.max(jnp.abs(x)) if percentile is None
             else jnp.percentile(jnp.abs(x), percentile))
        prev = maxima.get(name)
        maxima[name] = v if prev is None else jnp.maximum(prev, v)

    _TLS.observer = observe
    try:
        for x in batches:
            jax.block_until_ready(fwd(params, jnp.asarray(x, jnp.float32),
                                      compute_dtype))
    finally:
        _TLS.observer = None
    names = list(maxima)
    vals = np.asarray(jnp.stack([maxima[n] for n in names]))  # ONE fetch
    return {n: float(v) for n, v in zip(names, vals)}


def quantize_model(params: cpm.Params, model_type: str,
                   calib_batches: Iterable[np.ndarray],
                   compute_dtype=jnp.float32) -> cpm.Params:
    """One-call calibrate + quantize."""
    scales = calibrate_scales(params, model_type, calib_batches,
                              compute_dtype)
    return quantize_params(params, scales)
