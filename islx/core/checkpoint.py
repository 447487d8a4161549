"""Checkpointing: training state + whole-translator bundles.

The reference's checkpoint story is torch.load + name surgery for the pose
nets and keras save/load for the translator (src/body.py:35-36,
demo_isl_translate_one_model.py:121), with pipeline resume via output-file
markers. Here:

* :func:`save_pytree` / :func:`load_pytree` — orbax when available (async,
  sharding-aware), npz fallback — for any params/opt-state pytree.
* :func:`save_bundle` / :func:`load_bundle` — the "one model" equivalent of
  the reference's ``isl-translate-v1.keras``: body + hand + head params in
  one directory.
* training resume: :mod:`islx.isl.train`.fit(checkpoint_dir=...) saves per
  epoch and resumes from the latest.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except Exception:
        return False


def save_pytree(path: str, tree: Any) -> None:
    """Persist an arbitrary jax pytree (dicts/namedtuples of arrays)."""
    path = os.path.abspath(path)
    if _have_orbax():
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    with open(path + ".pkl", "wb") as f:
        pickle.dump({"leaves": [np.asarray(x) for x in leaves],
                     "treedef": treedef}, f)


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Load a pytree saved by :func:`save_pytree`.

    ``like`` (an example pytree) restores the exact structure/namedtuples;
    without it, orbax returns nested dicts.
    """
    path = os.path.abspath(path)
    if _have_orbax() and os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if like is not None:
            restored = ckptr.restore(
                path, item=jax.tree_util.tree_map(np.asarray, like))
        else:
            restored = ckptr.restore(path)
        return restored
    with open(path + ".pkl", "rb") as f:
        data = pickle.load(f)
    return jax.tree_util.tree_unflatten(data["treedef"], data["leaves"])


def exists(path: str) -> bool:
    return os.path.isdir(path) or os.path.exists(path + ".pkl")


# ---------------------------------------------------------------------------
# whole-translator bundle
# ---------------------------------------------------------------------------

_BUNDLE_META = "bundle.json"


def save_bundle(out_dir: str, body_params: Dict, hand_params: Dict,
                head_params: Dict, model_type: str = "body25") -> None:
    """One-directory translator bundle (cf. reference isl-translate-v1.keras)."""
    os.makedirs(out_dir, exist_ok=True)
    save_pytree(os.path.join(out_dir, "body"), body_params)
    save_pytree(os.path.join(out_dir, "hand"), hand_params)
    save_pytree(os.path.join(out_dir, "head"), head_params)
    with open(os.path.join(out_dir, _BUNDLE_META), "w") as f:
        json.dump({"model_type": model_type, "format": 1}, f)


def load_bundle(out_dir: str):
    """-> (body_params, hand_params, head_params, model_type)."""
    with open(os.path.join(out_dir, _BUNDLE_META)) as f:
        meta = json.load(f)
    body = load_pytree(os.path.join(out_dir, "body"))
    hand = load_pytree(os.path.join(out_dir, "hand"))
    head = load_pytree(os.path.join(out_dir, "head"))
    return body, hand, head, meta["model_type"]
