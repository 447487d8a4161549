"""Pose-net -> Keras export.

The reference converts its torch pose nets to Keras with the third-party
``pt2keras`` tracer (model_converter.py:11-43) and also ships hand-written
Keras ports (src/keras/model_keras.py:85-435, channels-first, with incomplete
weight loading). Here the Keras graph is built from the SAME declarative spec
tables that drive the JAX forwards (islx.models.cpm), channels-last, with
every Conv2D named by its caffe blob name — so weight transfer is a direct
per-layer assignment (islx params are already HWIO = Keras layout) and the
exported model is numerically identical to the JAX forward.

    python -m islx.cli.convert SRC DST.keras --model-type body25 --to-keras
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from islx.models import cpm


def _keras():
    import keras

    return keras


def _apply_conv(x, c: cpm.Conv):
    keras = _keras()
    x = keras.layers.Conv2D(
        c.cout, c.k, padding="same" if c.pad else "valid",
        activation=None, name=c.name)(x)
    if c.act == "relu":
        x = keras.layers.ReLU(name=f"relu_{c.name}")(x)
    elif c.act == "prelu":
        x = keras.layers.PReLU(shared_axes=[1, 2],
                               name=f"prelu_{c.name}")(x)
    return x


def _apply_seq(x, layers: Sequence[cpm.Layer]):
    keras = _keras()
    for layer in layers:
        if isinstance(layer, cpm.Pool):
            x = keras.layers.MaxPooling2D(pool_size=layer.k,
                                          strides=layer.s)(x)
        else:
            x = _apply_conv(x, layer)
    return x


def _apply_dense_block(x, convs: Sequence[cpm.Conv]):
    """body25 Mconv block: chain 3 convs, concat outputs on channels
    (reference semantics src/model.py:171-177)."""
    keras = _keras()
    outs = []
    out = x
    for c in convs:
        out = _apply_conv(out, c)
        outs.append(out)
    return keras.layers.Concatenate(axis=-1)(outs)


def build_keras_model(model_type: str, input_hw=(None, None)):
    """Functional Keras model mirroring the islx forward graph exactly."""
    keras = _keras()
    inp = keras.Input(shape=(input_hw[0], input_hw[1], 3), name="image")

    if model_type == "body25":
        spec = cpm.body25_spec()
        st = spec["stages"]

        def run_stage(tout, s, L):
            tout = _apply_dense_block(tout, st[f"Mconv1_stage{s}_{L}"])
            for i in range(2, 6):
                tout = _apply_dense_block(tout, st[f"Mconv{i}_stage{s}_{L}"])
            for c in st[f"Mconv6_7_stage{s}_{L}"]:
                tout = _apply_conv(tout, c)
            return tout

        out0 = _apply_seq(inp, spec["trunk"])
        tout, paf = out0, None
        for s in range(4):
            paf = run_stage(tout, s, "L2")
            tout = keras.layers.Concatenate(axis=-1)([out0, paf])
        heat0 = run_stage(tout, 0, "L1")
        tout = keras.layers.Concatenate(axis=-1)([out0, heat0, paf])
        heat = run_stage(tout, 1, "L1")
        outputs = [paf, heat]
    elif model_type == "coco":
        spec = cpm.coco_spec()
        heads = spec["heads"]
        out1 = _apply_seq(inp, spec["trunk"])
        a = _apply_seq(out1, heads["block1_L1"])
        b = _apply_seq(out1, heads["block1_L2"])
        for i in range(2, 7):
            x2 = _keras().layers.Concatenate(axis=-1)([a, b, out1])
            a = _apply_seq(x2, heads[f"block{i}_L1"])
            b = _apply_seq(x2, heads[f"block{i}_L2"])
        outputs = [a, b]
    elif model_type == "hand":
        spec = cpm.hand_spec()
        trunk = _apply_seq(inp, spec["trunk"])
        out = _apply_seq(trunk, spec["stage1"])
        for i in range(2, 7):
            x2 = _keras().layers.Concatenate(axis=-1)([out, trunk])
            out = _apply_seq(x2, spec["stages"][f"stage{i}"])
        outputs = [out]
    else:
        raise ValueError(model_type)
    return keras.Model(inp, outputs, name=f"islx_{model_type}")


def load_params_into(model, params: cpm.Params, model_type: str) -> None:
    """Assign islx params onto the Keras model by caffe blob name.

    islx 'w' is HWIO — exactly Keras Conv2D kernel layout, so no transpose
    (unlike the reference's OIHW chain). PReLU alphas broadcast to the
    keras (1,1,C) shared-axes shape.
    """
    for c in cpm.conv_layers(model_type):
        entry = params[c.name]
        model.get_layer(c.name).set_weights(
            [np.asarray(entry["w"]), np.asarray(entry["b"])])
        if c.act == "prelu":
            alpha = np.asarray(entry["p"]).reshape(1, 1, -1)
            model.get_layer(f"prelu_{c.name}").set_weights([alpha])


def params_from_keras(model, model_type: str) -> cpm.Params:
    """Inverse: read a (compatible) Keras pose model back into islx params."""
    import jax.numpy as jnp

    params: cpm.Params = {}
    for c in cpm.conv_layers(model_type):
        w, b = model.get_layer(c.name).get_weights()
        entry = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        if c.act == "prelu":
            (alpha,) = model.get_layer(f"prelu_{c.name}").get_weights()
            entry["p"] = jnp.asarray(alpha.reshape(-1))
        params[c.name] = entry
    return params


def export_keras(params: cpm.Params, model_type: str, path: str,
                 input_hw=(None, None)) -> None:
    """Build + load + save (.keras or .h5, chosen by extension)."""
    model = build_keras_model(model_type, input_hw)
    load_params_into(model, params, model_type)
    model.save(path)
