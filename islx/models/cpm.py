"""Convolutional Pose Machine trunks, TPU-native.

Three frozen-weight inference graphs with the same topology/IO contract as the
reference's torch modules, re-designed for XLA:

* ``body25``  — 4 PAF stages + 2 heatmap stages with Mconv dense blocks
  (reference topology: src/model.py:66-207). forward -> (paf[.,.,52], heat[.,.,26])
* ``coco``    — 6 two-branch refinement stages
  (reference topology: src/model.py:210-329). forward -> (paf[.,.,38], heat[.,.,19])
* ``hand``    — CPM hand net, 6 stages, 22 heatmap channels
  (reference topology: src/model.py:331-407). forward -> heat[.,.,22]

Design departures from the reference (TPU-first, not a port):

* NHWC activations / HWIO kernels (XLA's native TPU conv layout) instead of
  torch NCHW/OIHW.
* Parameters are a flat ``{caffe_layer_name: {'w','b'[,'p']}}`` pytree keyed by
  the original caffe blob names, so checkpoint ingestion is a pure transpose
  (no state_dict name surgery like reference src/util.py:35-44).
* Optional bfloat16 compute with float32 parameters: weights are cast at the
  conv, accumulation stays f32 via ``preferred_element_type``.
* Everything is a pure function of (params, x) — jit/pjit/vmap compose freely.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Dict[str, jax.Array]]


@dataclasses.dataclass(frozen=True)
class Conv:
    name: str
    cin: int
    cout: int
    k: int
    pad: int
    act: str  # 'relu' | 'prelu' | 'none'
    # head convs (1x1 stage outputs) keep a float32 bias/activation epilogue
    # even under bfloat16 compute — they are tiny (cout<=52) and their outputs
    # feed the peak/PAF math. Intermediate convs run the epilogue in the
    # compute dtype so full-resolution activations flow bf16 end-to-end
    # instead of materializing an f32 copy per conv (measured: the f32
    # intermediates tripled HBM traffic on the hand net trunk).
    head: bool = False


@dataclasses.dataclass(frozen=True)
class Pool:
    k: int = 2
    s: int = 2


Layer = Union[Conv, Pool]

# ---------------------------------------------------------------------------
# Layer spec tables. Names must equal caffe blob names for weight ingestion.
# ---------------------------------------------------------------------------


def _vgg_trunk(prelu_tail: bool) -> List[Layer]:
    """Shared VGG-ish feature trunk to conv4_4_CPM (128ch, /8 resolution)."""
    act_tail = "prelu" if prelu_tail else "relu"
    return [
        Conv("conv1_1", 3, 64, 3, 1, "relu"),
        Conv("conv1_2", 64, 64, 3, 1, "relu"),
        Pool(),
        Conv("conv2_1", 64, 128, 3, 1, "relu"),
        Conv("conv2_2", 128, 128, 3, 1, "relu"),
        Pool(),
        Conv("conv3_1", 128, 256, 3, 1, "relu"),
        Conv("conv3_2", 256, 256, 3, 1, "relu"),
        Conv("conv3_3", 256, 256, 3, 1, "relu"),
        Conv("conv3_4", 256, 256, 3, 1, "relu"),
        Pool(),
        Conv("conv4_1", 256, 512, 3, 1, "relu"),
        Conv("conv4_2", 512, 512, 3, 1, act_tail),
        Conv("conv4_3_CPM", 512, 256, 3, 1, act_tail),
        Conv("conv4_4_CPM", 256, 128, 3, 1, act_tail),
    ]


def _b25_dense_block(i: int, s: int, L: str, cin: int, c: int) -> List[Conv]:
    """A body25 Mconv dense block: 3 chained convs, outputs concatenated.

    Matches reference src/model.py:48-64,171-177 (make_layers_Mconv +
    _Mconv_forward): every conv is followed by PReLU.
    """
    base = f"Mconv{i}_stage{s}_{L}"
    return [
        Conv(f"{base}_0", cin, c, 3, 1, "prelu"),
        Conv(f"{base}_1", c, c, 3, 1, "prelu"),
        Conv(f"{base}_2", c, c, 3, 1, "prelu"),
    ]


def _b25_stage(s: int, L: str, cin: int, c: int, c6: int, cout: int) -> Dict[str, List[Conv]]:
    """One body25 refinement stage: 5 dense blocks + 1x1 head."""
    blocks = {}
    blocks[f"Mconv1_stage{s}_{L}"] = _b25_dense_block(1, s, L, cin, c)
    for i in range(2, 6):
        blocks[f"Mconv{i}_stage{s}_{L}"] = _b25_dense_block(i, s, L, 3 * c, c)
    blocks[f"Mconv6_7_stage{s}_{L}"] = [
        Conv(f"Mconv6_stage{s}_{L}", 3 * c, c6, 1, 0, "prelu"),
        Conv(f"Mconv7_stage{s}_{L}", c6, cout, 1, 0, "none", head=True),
    ]
    return blocks


def body25_spec() -> Dict[str, object]:
    """Full BODY_25 spec (reference topology: src/model.py:66-165)."""
    spec: Dict[str, object] = {"trunk": _vgg_trunk(prelu_tail=True)}
    stages = {}
    # PAF branch (L2): 4 stages.  stage0 from 128ch trunk, others from 180ch.
    stages.update(_b25_stage(0, "L2", 128, 96, 256, 52))
    for s in range(1, 4):
        stages.update(_b25_stage(s, "L2", 180, 128, 512, 52))
    # Heatmap branch (L1): stage0 from concat(trunk, paf)=180, stage1 from 206.
    stages.update(_b25_stage(0, "L1", 180, 96, 256, 26))
    stages.update(_b25_stage(1, "L1", 206, 128, 512, 26))
    spec["stages"] = stages
    return spec


def coco_spec() -> Dict[str, object]:
    """COCO-18 spec (reference topology: src/model.py:210-297)."""
    spec: Dict[str, object] = {"trunk": _vgg_trunk(prelu_tail=False)}
    heads = {}
    for L, cout in (("L1", 38), ("L2", 19)):
        heads[f"block1_{L}"] = [
            Conv(f"conv5_1_CPM_{L}", 128, 128, 3, 1, "relu"),
            Conv(f"conv5_2_CPM_{L}", 128, 128, 3, 1, "relu"),
            Conv(f"conv5_3_CPM_{L}", 128, 128, 3, 1, "relu"),
            Conv(f"conv5_4_CPM_{L}", 128, 512, 1, 0, "relu"),
            Conv(f"conv5_5_CPM_{L}", 512, cout, 1, 0, "none", head=True),
        ]
        for i in range(2, 7):
            # Reference quirk we reproduce exactly: its no-ReLU list
            # (src/model.py:215-218) names 'Mconv7_stage6_L1' twice and never
            # 'Mconv7_stage6_L2', so the FINAL heatmap conv is ReLU-clamped
            # while every other stage head is linear.
            head_act = "relu" if (i == 6 and L == "L2") else "none"
            heads[f"block{i}_{L}"] = [
                Conv(f"Mconv1_stage{i}_{L}", 185, 128, 7, 3, "relu"),
                Conv(f"Mconv2_stage{i}_{L}", 128, 128, 7, 3, "relu"),
                Conv(f"Mconv3_stage{i}_{L}", 128, 128, 7, 3, "relu"),
                Conv(f"Mconv4_stage{i}_{L}", 128, 128, 7, 3, "relu"),
                Conv(f"Mconv5_stage{i}_{L}", 128, 128, 7, 3, "relu"),
                Conv(f"Mconv6_stage{i}_{L}", 128, 128, 1, 0, "relu"),
                Conv(f"Mconv7_stage{i}_{L}", 128, cout, 1, 0, head_act,
                     head=True),
            ]
    spec["heads"] = heads
    return spec


def hand_spec() -> Dict[str, object]:
    """CPM hand spec (reference topology: src/model.py:331-390)."""
    trunk: List[Layer] = [
        Conv("conv1_1", 3, 64, 3, 1, "relu"),
        Conv("conv1_2", 64, 64, 3, 1, "relu"),
        Pool(),
        Conv("conv2_1", 64, 128, 3, 1, "relu"),
        Conv("conv2_2", 128, 128, 3, 1, "relu"),
        Pool(),
        Conv("conv3_1", 128, 256, 3, 1, "relu"),
        Conv("conv3_2", 256, 256, 3, 1, "relu"),
        Conv("conv3_3", 256, 256, 3, 1, "relu"),
        Conv("conv3_4", 256, 256, 3, 1, "relu"),
        Pool(),
        Conv("conv4_1", 256, 512, 3, 1, "relu"),
        Conv("conv4_2", 512, 512, 3, 1, "relu"),
        Conv("conv4_3", 512, 512, 3, 1, "relu"),
        Conv("conv4_4", 512, 512, 3, 1, "relu"),
        Conv("conv5_1", 512, 512, 3, 1, "relu"),
        Conv("conv5_2", 512, 512, 3, 1, "relu"),
        Conv("conv5_3_CPM", 512, 128, 3, 1, "relu"),
    ]
    stage1 = [
        Conv("conv6_1_CPM", 128, 512, 1, 0, "relu"),
        Conv("conv6_2_CPM", 512, 22, 1, 0, "none", head=True),
    ]
    stages = {}
    for i in range(2, 7):
        stages[f"stage{i}"] = [
            Conv(f"Mconv1_stage{i}", 150, 128, 7, 3, "relu"),
            Conv(f"Mconv2_stage{i}", 128, 128, 7, 3, "relu"),
            Conv(f"Mconv3_stage{i}", 128, 128, 7, 3, "relu"),
            Conv(f"Mconv4_stage{i}", 128, 128, 7, 3, "relu"),
            Conv(f"Mconv5_stage{i}", 128, 128, 7, 3, "relu"),
            Conv(f"Mconv6_stage{i}", 128, 128, 1, 0, "relu"),
            Conv(f"Mconv7_stage{i}", 128, 22, 1, 0, "none", head=True),
        ]
    return {"trunk": trunk, "stage1": stage1, "stages": stages}


# ---------------------------------------------------------------------------
# Spec -> flat list of conv layers (for init / param counting / ingestion)
# ---------------------------------------------------------------------------


def _iter_convs(spec: Dict[str, object]):
    def walk(node):
        if isinstance(node, Conv):
            yield node
        elif isinstance(node, Pool):
            return
        elif isinstance(node, (list, tuple)):
            for x in node:
                yield from walk(x)
        elif isinstance(node, dict):
            for x in node.values():
                yield from walk(x)

    yield from walk(spec)


def conv_layers(model_type: str) -> List[Conv]:
    spec = {"body25": body25_spec, "coco": coco_spec, "hand": hand_spec}[model_type]()
    return list(_iter_convs(spec))


def param_count(model_type: str) -> int:
    n = 0
    for c in conv_layers(model_type):
        n += c.k * c.k * c.cin * c.cout + c.cout
        if c.act == "prelu":
            n += c.cout
    return n


def init_params(model_type: str, key: Optional[jax.Array] = None,
                dtype=jnp.float32) -> Params:
    """He-normal random init (for tests/benchmarks; real use ingests weights).

    Runs entirely on the host CPU backend: ~100 per-layer PRNG ops + the key
    unstacking are tiny programs that would otherwise each round-trip the
    TPU relay before any real work starts (and the key-fetch is the process's
    FIRST device->host transfer — the one that trips the relay's permanent
    transfer degradation, CLAUDE.md). The threefry PRNG is deterministic
    across backends, so values are unchanged; pipelines upload the finished
    pytree once (`_device_resident`).
    """
    import contextlib

    try:
        ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:          # no CPU backend (never on CPython builds)
        ctx = contextlib.nullcontext()
    with ctx:
        if key is None:
            key = jax.random.PRNGKey(0)
        params: Params = {}
        layers = conv_layers(model_type)
        keys = jax.random.split(key, len(layers))
        for c, k in zip(layers, keys):
            fan_in = c.k * c.k * c.cin
            w = (jax.random.normal(k, (c.k, c.k, c.cin, c.cout), dtype)
                 * np.sqrt(2.0 / fan_in))
            entry = {"w": w, "b": jnp.zeros((c.cout,), dtype)}
            if c.act == "prelu":
                entry["p"] = jnp.full((c.cout,), 0.25, dtype)  # torch default
            params[c.name] = entry
    return params


def cast_params(params: Params, dtype) -> Params:
    """Pre-cast conv weights to the compute dtype (one-time HBM write).

    ``_conv`` casts ``w`` at every execution when the stored dtype differs
    from the compute dtype — for bf16 inference that is ~350MB of convert
    traffic per step across body25+hand. Casting once at pipeline build makes
    the per-step ``astype`` a no-op. Biases and PReLU slopes stay f32 (they
    are applied in the f32 epilogue).
    """
    return {
        name: {k: (v.astype(dtype) if k == "w" else v)
               for k, v in entry.items()}   # w_q/s_w/a_scale pass through
        for name, entry in params.items()
    }


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------


def _conv(x: jax.Array, p: Dict[str, jax.Array], c: Conv,
          compute_dtype=jnp.float32) -> jax.Array:
    from islx.models import quant

    if "w_q" in p:
        # int8-quantized layer (islx.models.quant): same epilogue semantics,
        # conv runs on the MXU's 2x int8 path
        return quant.conv_q(x, p, c, compute_dtype)
    obs = quant.observer()   # thread-local int8 calibration hook
    if obs is not None:
        obs(c.name, x)
    w = p["w"].astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w,
        window_strides=(1, 1),
        padding=[(c.pad, c.pad), (c.pad, c.pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    # Epilogue dtype: accumulation is always f32 (preferred_element_type);
    # intermediate convs round once to the compute dtype BEFORE bias+act so
    # XLA fuses the convert into the conv output and full-resolution
    # activations never materialize in f32 (bf16 halves the HBM traffic that
    # dominates the full-res trunk layers). Head convs (c.head) keep the f32
    # epilogue: their outputs are the heatmap/PAF tensors the peak math reads.
    epi = jnp.float32 if c.head else compute_dtype
    out = out.astype(epi) + p["b"].astype(epi)
    if c.act == "relu":
        out = jnp.maximum(out, jnp.asarray(0.0, epi))
    elif c.act == "prelu":
        a = p["p"].astype(epi)
        out = jnp.where(out >= 0, out, a * out)
    return out


def _maxpool2(x: jax.Array) -> jax.Array:
    # int8-aware: max-pool commutes with the (monotone) activation
    # quantization, so int8-resident chains pool the int8 directly.
    # init must stay a PYTHON scalar: an array init becomes a traced
    # operand and reverse-mode linearization of reduce_window fails.
    init = np.int8(-128) if x.dtype == jnp.int8 else -jnp.inf
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _seq(x: jax.Array, layers: Sequence[Layer], params: Params,
         compute_dtype) -> jax.Array:
    """Sequential chain with INT8-RESIDENT activations between consecutive
    quantized convs: instead of bf16-out -> separate quantize-in per conv
    (the clamp_convert fusions that were half the int8 device step,
    docs/PERFORMANCE.md round 3), each conv's epilogue emits int8 at the
    NEXT conv's activation scale, and max-pools between them run on int8
    (quantization is monotone, so pool∘quant == quant∘pool exactly).
    Float layers and the calibration pass are untouched."""
    from islx.models import quant

    n = len(layers)
    x_q = None   # int8 carry, quantized at the CURRENT conv's a_scale
    i = 0
    while i < n:
        layer = layers[i]
        if isinstance(layer, Pool):
            x = _maxpool2(x)
            i += 1
            continue
        p = params[layer.name]
        if "w_q" not in p:
            x = _conv(x, p, layer, compute_dtype)
            i += 1
            continue
        if x_q is None:
            x_q = quant.quantize_act(x, p["a_scale"])
        j = i + 1                      # next conv, skipping pools
        while j < n and isinstance(layers[j], Pool):
            j += 1
        nxt = params[layers[j].name] if j < n else None
        if nxt is not None and "w_q" in nxt and not layer.head:
            out_q = quant.conv_q_core(
                x_q, p, layer, compute_dtype,
                out_inv=127.0 / nxt["a_scale"].astype(jnp.float32))
            for _ in range(i + 1, j):
                out_q = _maxpool2(out_q)
            x_q, i = out_q, j
        else:
            x = quant.conv_q_core(x_q, p, layer, compute_dtype)
            x_q = None
            i += 1
    return x


def _dense_block(x: jax.Array, convs: Sequence[Conv], params: Params,
                 compute_dtype) -> jax.Array:
    """body25 Mconv block: chain 3 convs, concat their outputs on channels
    (reference semantics: src/model.py:171-177)."""
    outs = []
    out = x
    for c in convs:
        out = _conv(out, params[c.name], c, compute_dtype)
        outs.append(out)
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Model forwards (NHWC: x[B,H,W,3] -> feature maps at /8 resolution)
# ---------------------------------------------------------------------------

_B25 = body25_spec()
_COCO = coco_spec()
_HAND = hand_spec()


def body25_forward(params: Params, x: jax.Array,
                   compute_dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """BODY_25 forward: x[B,H,W,3] -> (paf[B,H/8,W/8,52], heat[B,H/8,W/8,26]).

    Stage wiring mirrors reference src/model.py:179-207.
    """
    st = _B25["stages"]

    def run_stage(tout, s, L):
        tout = _dense_block(tout, st[f"Mconv1_stage{s}_{L}"], params, compute_dtype)
        for i in range(2, 6):
            tout = _dense_block(tout, st[f"Mconv{i}_stage{s}_{L}"], params, compute_dtype)
        for c in st[f"Mconv6_7_stage{s}_{L}"]:
            tout = _conv(tout, params[c.name], c, compute_dtype)
        return tout

    out0 = _seq(x, _B25["trunk"], params, compute_dtype)
    tout = out0
    paf = None
    for s in range(4):
        paf = run_stage(tout, s, "L2")
        tout = jnp.concatenate([out0, paf], axis=-1)
    heat0 = run_stage(tout, 0, "L1")
    tout = jnp.concatenate([out0, heat0, paf], axis=-1)
    heat = run_stage(tout, 1, "L1")
    return paf, heat


def coco_forward(params: Params, x: jax.Array,
                 compute_dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """COCO forward: x[B,H,W,3] -> (paf[B,H/8,W/8,38], heat[B,H/8,W/8,19]).

    Stage wiring mirrors reference src/model.py:302-329.
    """
    heads = _COCO["heads"]
    out1 = _seq(x, _COCO["trunk"], params, compute_dtype)
    a = _seq(out1, heads["block1_L1"], params, compute_dtype)
    b = _seq(out1, heads["block1_L2"], params, compute_dtype)
    for i in range(2, 7):
        x2 = jnp.concatenate([a, b, out1], axis=-1)
        a = _seq(x2, heads[f"block{i}_L1"], params, compute_dtype)
        b = _seq(x2, heads[f"block{i}_L2"], params, compute_dtype)
    return a, b


def hand_forward(params: Params, x: jax.Array,
                 compute_dtype=jnp.float32, stages: int = 6) -> jax.Array:
    """Hand CPM forward: x[B,H,W,3] -> heat[B,H/8,W/8,22].

    Stage wiring mirrors reference src/model.py:394-407. ``stages`` stops
    refinement early and returns THAT stage's head output: the reference
    consumes only the final stage's heatmap (src/model.py:407), so trailing
    stages are a pure accuracy/FLOP trade — each trimmed stage cuts ~2.3
    GFLOP/crop at 184px. Accuracy-gated knob (HandConfig.stages,
    tools/hand_scale_eval.py measures the keypoint drift); default 6 is the
    reference-exact depth.
    """
    if not 1 <= stages <= 6:
        raise ValueError(f"hand stages must be in [1, 6], got {stages}")
    trunk = _seq(x, _HAND["trunk"], params, compute_dtype)
    out = _seq(trunk, _HAND["stage1"], params, compute_dtype)
    for i in range(2, stages + 1):
        x2 = jnp.concatenate([out, trunk], axis=-1)
        out = _seq(x2, _HAND["stages"][f"stage{i}"], params, compute_dtype)
    return out


def hand_forward_stages(params: Params, x: jax.Array,
                        compute_dtype=jnp.float32) -> list:
    """All six stage head outputs [B,H/8,W/8,22] (training only).

    The reference CPM family trains with INTERMEDIATE supervision — every
    stage's head is driven toward the target, which is also what makes the
    stage-trim knob (``hand_forward(..., stages=N)``) consume a trained
    head. Inference uses :func:`hand_forward` (final stage only,
    src/model.py:407)."""
    trunk = _seq(x, _HAND["trunk"], params, compute_dtype)
    out = _seq(trunk, _HAND["stage1"], params, compute_dtype)
    outs = [out]
    for i in range(2, 7):
        x2 = jnp.concatenate([out, trunk], axis=-1)
        out = _seq(x2, _HAND["stages"][f"stage{i}"], params, compute_dtype)
        outs.append(out)
    return outs


FORWARDS = {
    "body25": body25_forward,
    "coco": coco_forward,
    "hand": hand_forward,
}
