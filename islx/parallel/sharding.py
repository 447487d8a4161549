"""Sharded batch execution helpers (pjit-style, via jit + NamedSharding).

Data-parallel batched pose inference over a device mesh: the TPU-native
replacement for the reference's per-process model replicas
(extract_features_mp.py:156-164 builds one torch model per OS process; here
one jitted program spans all chips, frames sharded along ``data``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from islx.models import cpm
from islx.parallel import mesh as M


def make_batched_forward(model_type: str, mesh: Optional[Mesh] = None,
                         compute_dtype=jnp.bfloat16):
    """Batched CPM forward: x [B,H,W,3] normalized -> (paf, heat) (or heat).

    With a mesh, B is sharded along the data axis and params replicate; XLA
    compiles one SPMD program over all chips.
    """
    forward = cpm.FORWARDS[model_type]

    def fn(params, x):
        return forward(params, x, compute_dtype)

    if mesh is None:
        return jax.jit(fn)
    data = M.batch_sharding(mesh)
    rep = M.replicated(mesh)
    return jax.jit(fn, in_shardings=(rep, data), out_shardings=data)
