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


def make_batched_pose_maps(model_type: str, njoint: int, npaf: int,
                           mesh: Optional[Mesh] = None,
                           compute_dtype=jnp.bfloat16):
    """Batched normalize+forward+x8-upsample for fixed-size frame buckets.

    x: u8 [B,H,W,3] already resized to a stride-aligned bucket. Returns
    (heat [B,H,W,C], paf [B,H,W,P]) at input resolution — the batched
    equivalent of the reference's per-frame chain (src/body.py:51-78) minus
    the back-to-original-size resize, which the caller owns (coordinates
    scale linearly).
    """
    from islx.ops.resize import resize_cubic

    forward = cpm.FORWARDS[model_type]

    def fn(params, x):
        xn = x.astype(jnp.float32) / 256.0 - 0.5
        paf, heat = forward(params, xn, compute_dtype)
        h, w = x.shape[1], x.shape[2]
        heat = resize_cubic(heat, h, w)
        paf = resize_cubic(paf, h, w)
        return heat, paf

    if mesh is None:
        return jax.jit(fn)
    data = M.batch_sharding(mesh)
    rep = M.replicated(mesh)
    return jax.jit(fn, in_shardings=(rep, data), out_shardings=data)
