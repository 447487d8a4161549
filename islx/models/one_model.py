"""Whole-translator single-artifact export/import (.keras).

The reference can run end-to-end from ONE saved keras file,
``model/isl-translate-v1.keras``, that wraps the torch pose nets and the
LSTM head in a single keras.Model
(/root/reference/demo_isl_translate_one_model.py:121, saved by the commented
``isl_translator.save`` at demo_isl_translate.py:138-139). islx's native
bundle is the orbax checkpoint (islx.core.checkpoint.save_translator_bundle);
this module provides the PORTABLE equivalent: one ``.keras`` artifact that

* contains the body CPM, the hand CPM and the translation head as nested
  functional sub-models (built by islx.models.keras_export /
  translator.build_keras_head — every conv named by its caffe blob name);
* loads back into islx pytrees with ``import_one_model`` (and, being plain
  keras with no Torch wrapper layers, ALSO loads in stock keras anywhere);
* round-trips numerically (tests/test_one_model.py).

The reference's own artifact cannot be loaded without the reference's
custom ``ISLSignPosTranslator``/``TorchModuleWrapper`` classes on the
python path (keras deserialization instantiates them); given those, its
torch state feeds islx via islx.core.weights.load — documented in
PARITY.md rather than emulated here.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from islx.core.config import TranslatorConfig
from islx.models import cpm
from islx.models import keras_export as KE
from islx.models import translator as T

BODY_NAME = "islx_body25"
COCO_NAME = "islx_coco"
HAND_NAME = "islx_hand"
HEAD_NAME = "islx_head"


def export_one_model(body_params: cpm.Params, hand_params: cpm.Params,
                     head_params: T.Params, path: str,
                     model_type: str = "body25",
                     cfg: Optional[TranslatorConfig] = None) -> None:
    """Save body+hand+head as one ``.keras`` artifact.

    The composite is a multi-input functional model (image -> body outputs,
    crop -> hand heatmap, feature window -> expression softmax); the pose
    post-processing between those tensors is host/XLA code in both islx and
    the reference (its keras composite also drops to numpy between nets,
    src/ISL_Model_parameter.py:51-60), so the artifact carries exactly the
    learnable graph."""
    import keras

    cfg = cfg or TranslatorConfig()
    body = KE.build_keras_model(model_type, (None, None))
    KE.load_params_into(body, body_params, model_type)
    hand = KE.build_keras_model("hand", (None, None))
    KE.load_params_into(hand, hand_params, "hand")
    head = T.build_keras_head(cfg, name=HEAD_NAME)
    head.set_weights([w for ws in T.to_keras_weights(head_params)
                      for w in ws])

    img = keras.Input(shape=(None, None, 3), name="image")
    crop = keras.Input(shape=(None, None, 3), name="hand_crop")
    window = keras.Input(shape=(cfg.window_size, cfg.feature_dim),
                         name="feature_window")
    outs = list(body(img)) + list(hand(crop)) + [head(window)]
    keras.Model([img, crop, window], outs,
                name="islx_translate_one_model").save(path)


def import_one_model(path: str, model_type: str = "body25"
                     ) -> Tuple[cpm.Params, cpm.Params, T.Params]:
    """Load a one-model artifact -> (body_params, hand_params, head_params).

    Accepts both islx exports (sub-models found by name) and any artifact
    whose nested models carry caffe-blob-named conv layers + a head with
    the reference's layer sequence."""
    import keras

    model = keras.models.load_model(path, compile=False)
    sub = {layer.name: layer for layer in model.layers}
    pose_name = BODY_NAME if model_type == "body25" else COCO_NAME
    body = sub.get(pose_name)
    hand = sub.get(HAND_NAME)
    head = sub.get(HEAD_NAME)
    if body is None or hand is None or head is None:
        raise ValueError(
            f"not an islx one-model artifact: sub-models {sorted(sub)} "
            f"(expected {pose_name}, {HAND_NAME}, {HEAD_NAME})")
    body_params = KE.params_from_keras(body, model_type)
    hand_params = KE.params_from_keras(hand, "hand")
    weight_lists = [l.get_weights() for l in head.layers if l.get_weights()]
    head_params = T.from_keras_weights(weight_lists)
    return body_params, hand_params, head_params
