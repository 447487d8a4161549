"""Checkpoint ingestion: caffe/torch weight dumps -> islx JAX pytrees.

Replaces the reference's conversion chain (caffemodel2pytorch/caffemodel2pytorch.py
-> torch .pt flat dict -> src/util.py:35-44 ``transfer`` name surgery ->
``load_state_dict``) with a single pure-numpy mapping:

    flat {caffe_layer}.weight/.bias dict  ->  {layer: {'w' HWIO,'b'[,'p']}}

Accepted sources:
* ``.pt`` / ``.pth`` files written by the reference converter (flat caffe names,
  reference caffemodel2pytorch/caffemodel2pytorch.py:388,401-402) — loaded with
  torch if available.
* torch ``state_dict`` of the reference modules (module-path-prefixed names,
  e.g. ``model0.conv1_1.weight`` or ``models.Mconv1_stage0_L2.0.…``) — the
  prefix-strip mirrors reference src/util.py:35-44.
* raw ``.caffemodel`` via :mod:`islx.core.caffe_reader` (no protobuf codegen).
* ``.npz`` written by :func:`save_npz` (the islx-native format).
"""
from __future__ import annotations

import os
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from islx.models import cpm

Params = cpm.Params


def _prelu_key(conv_name: str) -> str:
    """Caffe PReLU blob name for a conv layer.

    Trunk convs: ``conv4_2 -> prelu4_2``; Mconv convs:
    ``Mconv1_stage0_L2_0 -> Mprelu1_stage0_L2_0``
    (naming rule from reference src/model.py:43,62).
    """
    if conv_name.startswith("Mconv"):
        return "Mprelu" + conv_name[len("Mconv"):]
    return "prelu" + conv_name[len("conv"):]


def _strip_module_prefix(name: str) -> str:
    """Strip torch module paths, mirroring reference src/util.py:35-44."""
    parts = name.split(".")
    if len(parts) > 4:      # body25 ModuleDict nesting
        return ".".join(parts[3:])
    if len(parts) > 2:      # e.g. model0.conv1_1.weight
        return ".".join(parts[1:])
    return name


def from_flat_dict(flat: Mapping[str, np.ndarray], model_type: str,
                   dtype=jnp.float32) -> Params:
    """Build islx params from a flat ``{caffe_name}.weight/.bias`` mapping.

    Conv weights arrive as torch/caffe OIHW [cout,cin,kh,kw] and are transposed
    to HWIO. PReLU alphas arrive as [cout].
    """
    # Normalize: strip any module prefixes so both converter output and raw
    # state_dicts work.
    norm: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        norm[_strip_module_prefix(k)] = np.asarray(v)

    params: Params = {}
    for c in cpm.conv_layers(model_type):
        w = norm[f"{c.name}.weight"]
        b = norm[f"{c.name}.bias"]
        if w.shape != (c.cout, c.cin, c.k, c.k):
            raise ValueError(
                f"{c.name}: expected OIHW {(c.cout, c.cin, c.k, c.k)}, got {w.shape}")
        entry = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
            "b": jnp.asarray(b, dtype),
        }
        if c.act == "prelu":
            pk = _prelu_key(c.name)
            alpha = norm[f"{pk}.weight"]
            entry["p"] = jnp.asarray(alpha.reshape(-1), dtype)
        params[c.name] = entry
    return params


def load(path: str, model_type: str, dtype=jnp.float32) -> Params:
    """Load weights from .pt/.pth (torch), .npz (islx), .caffemodel, or an
    islx pytree checkpoint directory (e.g. an int8-quantized pytree from
    ``python -m islx.cli.quantize`` — loaded as-is, every pipeline accepts
    quantized params transparently via cpm._conv's w_q dispatch)."""
    from islx.core import checkpoint as C

    if os.path.isdir(path) or os.path.exists(path + ".pkl"):
        return C.load_pytree(path)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        return load_npz(path, model_type, dtype)
    if ext in (".pt", ".pth"):
        import torch  # CPU-only use, just for deserialization

        sd = torch.load(path, map_location="cpu", weights_only=False)
        flat = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sd.items()}
        return from_flat_dict(flat, model_type, dtype)
    if ext == ".caffemodel":
        from islx.core.caffe_reader import read_caffemodel

        return from_flat_dict(read_caffemodel(path), model_type, dtype)
    raise ValueError(f"unsupported checkpoint format: {path}")


def save_npz(path: str, params: Params) -> None:
    flat = {}
    for name, entry in params.items():
        for k, v in entry.items():
            flat[f"{name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_npz(path: str, model_type: str, dtype=jnp.float32) -> Params:
    data = np.load(path)
    params: Params = {}
    for c in cpm.conv_layers(model_type):
        entry = {
            "w": jnp.asarray(data[f"{c.name}/w"], dtype),
            "b": jnp.asarray(data[f"{c.name}/b"], dtype),
        }
        if c.act == "prelu":
            entry["p"] = jnp.asarray(data[f"{c.name}/p"], dtype)
        params[c.name] = entry
    return params


def to_flat_dict(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`from_flat_dict` (OIHW torch layout), for round-trips."""
    flat: Dict[str, np.ndarray] = {}
    for name, entry in params.items():
        flat[f"{name}.weight"] = np.asarray(entry["w"]).transpose(3, 2, 0, 1)
        flat[f"{name}.bias"] = np.asarray(entry["b"])
        if "p" in entry:
            flat[f"{_prelu_key(name)}.weight"] = np.asarray(entry["p"])
    return flat
