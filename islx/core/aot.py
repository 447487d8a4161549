"""AOT program artifacts: serialize compiled pipeline executables to disk.

XLA compiles one program per (batch, bucket, format) — 20-40s each on TPU —
and the compile happens in-process, so every restart of a serving host
re-pays it (the reference has no deployment story at all: its demos build
models synchronously at import, /root/reference/demo_video.py:48-49, and pay
full model-load per process). islx already removes *re*-compiles on one
host via the persistent jax compilation cache; this module makes warm
starts an explicit, shippable artifact:

* ``save_fused(pipe, path, ...)`` serializes the fused body+hand program
  for a given (batch, bucket, format) plus an environment fingerprint
  (platform, jax version, pack/paf modes, program key). Two kinds:
  ``exe`` (jax.experimental.serialize_executable — the compiled PJRT
  executable itself, zero work at load; TPU default) and ``hlo``
  (jax.export StableHLO — portable across hosts, skips trace/lower, the
  XLA compile at first dispatch rides the compilation cache; CPU default,
  since XLA:CPU's AOT loader refuses mismatched compile-machine features).
* ``load_fused(pipe, path)`` / ``preload_dir(pipe, dir)`` install matching
  artifacts straight into the pipeline's program cache — the first request
  at that resolution dispatches immediately.

The program bytes depend only on SHAPES and pipeline config, never on
weight values (params are runtime arguments), so artifacts built with
random init weights serve real checkpoints unchanged.

``load`` verifies the fingerprint and raises ``AotMismatch`` (or skips, in
``preload_dir``) instead of loading a foreign artifact. Load only trusted
files — the container (and the ``exe`` payload) is pickle, which executes
during deserialization.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional, Tuple

import jax
import numpy as np

_MAGIC = "islx-aot-v1"


class AotMismatch(RuntimeError):
    """Artifact does not match this process (platform/version/config)."""


def _param_specs(params):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params)


def _params_sig(params) -> str:
    """Short hash of a param pytree's structure + leaf shapes/dtypes. The
    program's input avals bake this in (e.g. int8-quantized trunks carry
    extra scale leaves), so it is part of the artifact fingerprint."""
    import hashlib

    leaves, treedef = jax.tree.flatten(params)
    s = str(treedef) + ";".join(
        f"{np.shape(x)}{np.result_type(x)}" for x in leaves)
    return hashlib.sha1(s.encode()).hexdigest()[:16]


# Fingerprint fields added after the first artifacts shipped: an artifact
# that predates a field is treated as built at that field's DOCUMENTED
# default and the default is compared against the current pipeline's value
# (never skipped — e.g. an old artifact exported under ISLX_HAND_STAGES=5
# lacks "hand_stages" but was NOT built at 6 stages; skipping the check
# would silently serve the wrong CPM depth, ADVICE r4). So old artifacts
# only load when the pipeline actually sits at the default configuration.
_LENIENT_DEFAULTS = {
    "det_cfg": (0.33, 1.5, 0.9, 20, 2),   # dataclasses.astuple(DetectorConfig())
    "hand_boxsize": 368,                  # HandConfig.boxsize
    "crop_chunk": None,                   # BatchedHandPipeline default
    "two_stage_peaks": True,              # BatchedBodyPipeline default
    "fused_peaks": True,                  # follows two_stage_peaks
    "thre2": 0.05,                        # PoseConfig.thre2
    "hand_stages": 6,                     # HandConfig.stages
}


def _fingerprint(pipe) -> dict:
    import dataclasses

    dev = jax.devices()[0]
    return {
        "magic": _MAGIC,
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "jax": jax.__version__,
        "model_type": pipe.model_type,
        "pack_mode": pipe.body.pack_mode,
        "paf_mode": getattr(pipe.body, "paf_mode", None),
        "max_peaks": pipe.body.cfg.max_peaks,
        "top_m": pipe.body.top_m,
        "hand_scales": tuple(pipe.hand.cfg.scale_search),
        "hand_stages": pipe.hand.cfg.stages,
        "params_sig": _params_sig((pipe.body.params, pipe.hand.params)),
        # mesh-sharded programs pin device topology; serving uses mesh=None
        "sharded": pipe.mesh is not None,
        # compiled-in constants the early fingerprint missed: a config
        # change here silently served stale programs (round-3 review)
        "det_cfg": dataclasses.astuple(pipe.det_cfg),
        "hand_boxsize": pipe.hand.cfg.boxsize,
        "crop_chunk": getattr(pipe.hand, "crop_chunk", None),
        "two_stage_peaks": getattr(pipe.body, "two_stage_peaks", None),
        "fused_peaks": getattr(pipe.body, "fused_peaks", None),
        "thre2": pipe.body.cfg.thre2,
    }


def fused_input_specs(pipe, b: int, hb: int, wb: int,
                      input_format: str = "bgr"):
    """ShapeDtypeStructs for the fused program's runtime arguments."""
    import jax.numpy as jnp

    n = b * hb * wb * 3
    if input_format == "yuv420":
        n = b * hb * wb * 3 // 2
    return (_param_specs(pipe.body.params), _param_specs(pipe.hand.params),
            jax.ShapeDtypeStruct((n,), np.uint8),
            jax.ShapeDtypeStruct((), np.dtype(jnp.float32)))


def compile_fused(pipe, b: int, hb: int, wb: int,
                  orig_hw: Optional[Tuple[int, int]] = None,
                  input_format: str = "bgr"):
    """AOT-compile one fused program; returns (key, jax.stages.Compiled)."""
    key = pipe.program_key(b, hb, wb, orig_hw or (hb, wb), input_format)
    jitted = pipe._program(*key)
    specs = fused_input_specs(pipe, b, hb, wb, input_format)
    return key, jitted.lower(*specs).compile()


def default_kind() -> str:
    """'exe' (serialized PJRT executable — zero work at load; pinned to
    platform+version) on TPU; 'hlo' (jax.export StableHLO — skips
    trace/lower, XLA compile runs at first dispatch, amortized by the
    persistent compilation cache) elsewhere. XLA:CPU's AOT loader bakes
    compile-machine features and refuses mismatched hosts, so 'hlo' is the
    reliable CPU default."""
    return "exe" if jax.default_backend() == "tpu" else "hlo"


def save_fused(pipe, path: str, b: int, hb: int, wb: int,
               orig_hw: Optional[Tuple[int, int]] = None,
               input_format: str = "bgr",
               kind: Optional[str] = None) -> dict:
    """Compile + serialize one fused program to ``path``. Returns its meta."""
    kind = kind or default_kind()
    n_dev = 1 if pipe.mesh is None else int(pipe.mesh.devices.size)
    meta = dict(_fingerprint(pipe), kind=kind, num_devices=n_dev)
    if kind == "exe":
        from jax.experimental import serialize_executable as se

        key, compiled = compile_fused(pipe, b, hb, wb, orig_hw,
                                      input_format)
        payload, in_tree, out_tree = se.serialize(compiled)
        blob = {"meta": meta, "payload": payload,
                "in_tree": pickle.dumps(in_tree),
                "out_tree": pickle.dumps(out_tree)}
    elif kind == "hlo":
        from jax import export as jexport

        key = pipe.program_key(b, hb, wb, orig_hw or (hb, wb),
                               input_format)
        jitted = pipe._program(*key)
        specs = fused_input_specs(pipe, b, hb, wb, input_format)
        exp = jexport.export(
            jitted,
            # Pallas kernels (islx.ops.pallas_peaks) lower to Mosaic
            # custom calls; they are part of the program, not a hazard
            disabled_checks=[jexport.DisabledSafetyCheck.custom_call(
                "tpu_custom_call")])(*specs)
        blob = {"meta": meta, "payload": exp.serialize()}
    else:
        raise ValueError(f"unknown artifact kind {kind!r}")
    meta["key"] = list(key)          # blob["meta"] is this same dict
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)          # atomic: partial writes never load
    return meta


def read_meta(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)["meta"]


def load_fused(pipe, path: str):
    """Install an artifact into ``pipe``'s program cache; returns its key.

    Raises AotMismatch when the artifact was built for a different
    platform / jax version / pipeline configuration.
    """
    with open(path, "rb") as f:
        blob = pickle.load(f)
    meta, want = blob["meta"], _fingerprint(pipe)
    if meta.get("magic") != _MAGIC:
        raise AotMismatch(f"{path}: not an islx AOT artifact")
    if meta.get("kind") == "hlo":
        # jax-version pinning only matters for the pickled executable;
        # serialized StableHLO is versioned by jax.export itself
        want.pop("jax", None)
        want.pop("device_kind", None)
    def _norm(v):
        # pickle round-trips tuples, JSON-ish paths lists: compare shape-blind
        return [_norm(x) for x in v] if isinstance(v, (tuple, list)) else v

    def _got(k):
        if k in meta:
            return meta[k]
        return _LENIENT_DEFAULTS.get(k)   # pre-field artifact: its default

    mismatched = {k: (_got(k), v) for k, v in want.items()
                  if _norm(_got(k)) != _norm(v)}
    if mismatched:
        raise AotMismatch(f"{path}: artifact/env mismatch {mismatched}")
    n_dev = int(meta.get("num_devices", 1))
    devs = jax.devices()
    if len(devs) < n_dev:
        raise AotMismatch(
            f"{path}: needs {n_dev} devices, host has {len(devs)}")
    if meta.get("kind") == "hlo":
        from jax import export as jexport

        exp = jexport.deserialize(blob["payload"])
        program = jax.jit(exp.call)
    else:
        from jax.experimental import serialize_executable as se

        program = se.deserialize_and_load(
            blob["payload"], pickle.loads(blob["in_tree"]),
            pickle.loads(blob["out_tree"]),
            execution_devices=devs[:n_dev])
    key = tuple(meta["key"])
    key = (int(key[0]), int(key[1]), int(key[2]),
           float(key[3]), float(key[4]), str(key[5]))
    pipe._programs[key] = program
    return key


def preload_dir(pipe, dirpath: str, verbose: bool = False) -> List[tuple]:
    """Load every matching ``*.islxprog`` artifact in ``dirpath``.

    Foreign artifacts (other platform / jax version / config) are skipped,
    not fatal — a serving host warms what it can and compiles the rest.
    """
    keys = []
    if not os.path.isdir(dirpath):
        return keys
    for name in sorted(os.listdir(dirpath)):
        if not name.endswith(".islxprog"):
            continue
        path = os.path.join(dirpath, name)
        try:
            keys.append(load_fused(pipe, path))
            if verbose:
                print(f"[aot] loaded {name} -> key {keys[-1]}")
        except AotMismatch as e:
            if verbose:
                print(f"[aot] skipped {name}: {e}")
        except Exception as e:            # truncated/foreign file
            if verbose:
                print(f"[aot] unreadable {name}: {e}")
    return keys


def artifact_name(key) -> str:
    b, hb, wb, sy, sx, fmt = key
    return f"fused_b{b}_{hb}x{wb}_sy{sy:g}_sx{sx:g}_{fmt}.islxprog"
