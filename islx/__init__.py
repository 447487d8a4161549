"""islx — TPU-native (JAX/XLA/Pallas) sign-language pose & translation framework.

A ground-up re-design of the capabilities of
`sunilsarolkarcds/ISL-SignLanguage-Translation` (reference mounted at
/root/reference): CMU-OpenPose-style body pose (COCO-18 + BODY_25), CPM hand
pose (21 keypoints), and an Indian-Sign-Language translator (156-dim per-frame
pose features -> 20-frame rolling window -> BiLSTM over 167 expressions).

Everything on the compute path is JAX: convolutional trunks run as jitted
XLA programs in NHWC/bfloat16 on the MXU, the post-processing (gaussian NMS,
PAF line integrals, connected components) is fused on-device, and batch/data
parallelism is expressed with jax.sharding over a device mesh rather than the
reference's multiprocessing (reference: extract_features_mp.py:156-239).
"""

__version__ = "0.1.0"

_LAZY = {
    "Body": ("islx.pose.body", "Body"),
    "Hand": ("islx.pose.hand", "Hand"),
    "hand_detect": ("islx.pose.detector", "hand_detect"),
    "ImagePose": ("islx.pipeline.image", "ImagePose"),
    "ISLSignPos": ("islx.isl.translator", "ISLSignPos"),
    "ISLTranslator": ("islx.isl.translator", "ISLTranslator"),
    "BatchedBodyPipeline": ("islx.pipeline.batch_pose", "BatchedBodyPipeline"),
    "BatchedHandPipeline": ("islx.pipeline.batch_pose", "BatchedHandPipeline"),
    "BatchedTranslatePipeline": ("islx.pipeline.translate",
                                 "BatchedTranslatePipeline"),
    "EXPRESSIONS": ("islx.isl.expressions", "EXPRESSIONS"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'islx' has no attribute {name!r}")
