"""Run the REFERENCE pipeline as a test oracle (no code copied — we import
/root/reference with stubbed optional deps and stubbed torch models so its
exact post-processing executes on synthetic network outputs)."""
import sys
import types

import numpy as np

REFERENCE = "/root/reference"
_stubbed = False


def _install_stubs():
    """torchvision (unused import in src/body.py:9) and skimage.measure.label
    (scipy.ndimage.label with 8-connectivity is equivalent for 2-D)."""
    global _stubbed
    if _stubbed:
        return
    import scipy.ndimage as ndi

    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)

    sk = types.ModuleType("skimage")
    skm = types.ModuleType("skimage.measure")

    def label(binary, return_num=False, connectivity=None):
        structure = np.ones((3, 3)) if connectivity == binary.ndim else None
        lab, n = ndi.label(binary, structure=structure)
        return (lab, n) if return_num else lab

    skm.label = label
    sk.measure = skm
    sys.modules.setdefault("skimage", sk)
    sys.modules.setdefault("skimage.measure", skm)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _stubbed = True


class _StubNet:
    """Stands in for the torch CPM: returns canned maps for any input."""

    def __init__(self, outputs):
        self._outputs = outputs

    def __call__(self, data):
        import torch

        shape = tuple(data.shape[2:])
        out = self._outputs[shape]
        if isinstance(out, tuple):
            return tuple(torch.from_numpy(o) for o in out)
        return torch.from_numpy(out)


def reference_body(ori_img: np.ndarray, outputs: dict, model_type="body25"):
    """Reference Body.__call__ on synthetic net outputs.

    outputs: {(h_in, w_in): (paf[1,P,h8,w8], heat[1,C,h8,w8]) float32} keyed by
    the padded network input spatial shape.
    """
    _install_stubs()
    from src.body import Body

    body = object.__new__(Body)
    body.model = _StubNet(outputs)
    body.model_type = model_type
    body.njoint = 26 if model_type == "body25" else 19
    body.npaf = 52 if model_type == "body25" else 38
    return body(ori_img)


def reference_hand(crop: np.ndarray, outputs: dict):
    """Reference Hand.__call__ on synthetic net outputs (keyed like above)."""
    _install_stubs()
    from src.hand import Hand

    hand = object.__new__(Hand)
    hand.model = _StubNet(outputs)
    return hand(crop)


def reference_hand_detect(candidate, subset, ori_img):
    _install_stubs()
    from src import util

    return util.handDetect(candidate, subset, ori_img)
