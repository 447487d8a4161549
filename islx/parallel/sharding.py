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


def make_spatial_forward(model_type: str, mesh: Mesh,
                         compute_dtype=jnp.bfloat16):
    """Spatially-partitioned CPM forward: x [B,H,W,3] -> (paf, heat).

    Frames' WIDTH is sharded over the ``model`` axis (params replicate;
    batch stays sharded over ``data``): each chip computes a vertical
    stripe of every frame and XLA's SPMD partitioner inserts the halo
    exchanges the 3x3 convs need at stripe edges. This is the
    few-large-frames regime — a 4K multi-person frame's conv FLOPs spread
    over chips when the batch is too small to fill the data axis. W should
    be divisible by 8 * n_model so the /8-stride pool grid splits evenly
    (XLA still compiles otherwise, but pads every stage).
    """
    forward = cpm.FORWARDS[model_type]

    def fn(params, x):
        return forward(params, x, compute_dtype)

    spatial = M.spatial_sharding(mesh)
    rep = M.replicated(mesh)
    return jax.jit(fn, in_shardings=(rep, spatial), out_shardings=spatial)
