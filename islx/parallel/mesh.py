"""Device mesh construction and sharding rules.

The reference's only parallelism is OS-process data parallelism over videos
(extract_features_mp.py:156-239, mp.Queue host IPC). The TPU-native
equivalent is a single ``jax.sharding.Mesh`` over ICI with:

* ``data`` axis — batch/data parallelism (frames, windows, videos)
* ``model`` axis — optional tensor parallelism for the translator head's
  LSTM/dense kernels (the CPM trunks are ~26-52M params and replicate)

Collectives are inserted by XLA from sharding annotations (psum for grads
along ``data``, all-gathers along ``model``) — no NCCL/MPI-style plumbing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh; defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC layout: batch over ``data``, width over ``model`` (dp x sp).

    Spatial partitioning serves the few-large-frames regime (4K multi-person
    scenes) where the batch alone can't fill the mesh: each chip owns a
    vertical stripe of its frames and XLA inserts halo exchanges
    (collective-permutes of 1-2 edge columns) around the 3x3 convs. Rides
    the same mesh axis as head tensor parallelism — spatial stripes ARE the
    conv analogue of TP."""
    return NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _divides(dim: int, n: int) -> bool:
    return n > 0 and dim % n == 0


def translator_param_spec(name: str, key: str, shape: Tuple[int, ...],
                          n_model: int) -> P:
    """Tensor-parallel rules for the BiLSTM head.

    LSTM kernels [F,4U] and recurrent [U,4U] shard the gate dim over
    ``model``; hidden dense kernels shard the output dim. Biases/BN stats and
    the (prime-sized, 167-way) output projection replicate.
    """
    if n_model <= 1:
        return P()
    if name.startswith("lstm") and key in ("kernel", "recurrent") \
            and _divides(shape[1], n_model):
        return P(None, MODEL_AXIS)
    if name.startswith("lstm") and key == "bias" and _divides(shape[0], n_model):
        return P(MODEL_AXIS)
    if name in ("dense1", "dense2") and key == "kernel" \
            and _divides(shape[1], n_model):
        return P(None, MODEL_AXIS)
    return P()


def shard_translator_params(params, mesh: Mesh):
    """Place translator params on the mesh under the TP rules."""
    n_model = mesh.shape[MODEL_AXIS]

    out = {}
    for name, entry in params.items():
        out[name] = {}
        for key, v in entry.items():
            spec = translator_param_spec(name, key, v.shape, n_model)
            out[name][key] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def translator_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching shard_translator_params placement."""
    n_model = mesh.shape[MODEL_AXIS]
    return {
        name: {key: NamedSharding(
            mesh, translator_param_spec(name, key, v.shape, n_model))
            for key, v in entry.items()}
        for name, entry in params.items()
    }


def shard_cpm_params(params, mesh: Mesh):
    """CPM trunks replicate (26-52M params fit comfortably per chip)."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, rep), params)


# ---------------------------------------------------------------------------
# Multi-host (DCN) glue
# ---------------------------------------------------------------------------


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join a multi-process JAX cluster (one process per host/pod slice).

    Wraps ``jax.distributed.initialize``: on TPU pods the three arguments
    auto-detect from the runtime; elsewhere they come from the arguments or
    the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID). Safe to call twice (no-op) and a no-op for plainly
    single-process runs (no coordinator configured anywhere).

    After this, ``jax.devices()`` spans all hosts, meshes built by
    :func:`make_mesh` cover the full ICI+DCN topology, and
    ``jax.process_index()/process_count()`` drive the per-host input sharding
    (islx.cli.extract defaults). Returns True when a multi-process runtime is
    active.
    """
    import os

    # NB: must not touch the backend (jax.process_count etc.) before
    # jax.distributed.initialize — probe the distributed client directly.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        return False  # single-process run, nothing to join
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def global_batch_from_local(mesh: Mesh, local_batch) -> jax.Array:
    """Per-host local batch -> one global array sharded over ``data``.

    Multi-host input pipeline contract (SURVEY.md §5): each host loads only
    its own slice of the batch (e.g. its video shard), and the global device
    array is assembled WITHOUT cross-host data movement —
    ``jax.make_array_from_process_local_data`` places each host's rows on its
    own devices; only jitted collectives ride DCN afterwards.
    """
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), np.asarray(local_batch))
