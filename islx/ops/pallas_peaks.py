"""Pallas TPU kernel: fused NMS + first-K peak selection in VMEM.

The XLA peak epilogue (islx.ops.peaks._nms_mask + _first_k_masked) is exact
but memory-bound OFF-chip: profiled on the B=192 fused program it
materializes the bool mask, an s32 rank tensor ([B,25,184,128], 452MB) and
three layout copies of it in HBM — ~28ms/step, the single largest non-conv
cost (docs/PERFORMANCE.md round 3). This kernel reads the blurred heatmaps
ONCE and emits only the [C,K] peak indices: the mask, candidate map and the
K min-extractions all live in VMEM.

Selection semantics are identical to _first_k_masked (reference
src/body.py:90-103 via islx.ops.peaks): the K first row-major positions of
the 4-neighbour plateau mask, ascending, sentinel H*W when fewer than K —
pinned against the XLA path in tests/test_pallas_kernels.py.

Grid: one program per frame; all C channels of one frame share the block
(C on the major axis keeps W on the 128-lane axis).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_first_k_kernel(thre_ref, blurred_ref, idx_ref):
    c, h, w = blurred_ref.shape[1], blurred_ref.shape[2], blurred_ref.shape[3]
    k = idx_ref.shape[2]
    n = jnp.int32(h * w)
    b = blurred_ref[0]                                   # [C,H,W] f32
    thre = thre_ref[0, 0]

    # 4-neighbour plateau NMS, out-of-image neighbours compare as 0
    # (islx.ops.peaks._nms_mask semantics)
    zrow = jnp.zeros_like(b[:, :1, :])
    zcol = jnp.zeros_like(b[:, :, :1])
    up = jnp.concatenate([zrow, b[:, :-1, :]], axis=1)
    down = jnp.concatenate([b[:, 1:, :], zrow], axis=1)
    left = jnp.concatenate([zcol, b[:, :, :-1]], axis=2)
    right = jnp.concatenate([b[:, :, 1:], zcol], axis=2)
    mask = ((b >= up) & (b >= down) & (b >= left) & (b >= right)
            & (b > thre))

    flat = (jax.lax.broadcasted_iota(jnp.int32, (c, h, w), 1) * w
            + jax.lax.broadcasted_iota(jnp.int32, (c, h, w), 2))
    cand = jnp.where(mask, flat, n)                      # [C,H,W]

    # K sequential min-extractions: the k-th row-major peak is the smallest
    # remaining flat index; clear it and repeat. All K passes stay in VMEM.
    # Every intermediate stays rank>=2 — Mosaic's layout pass aborts on
    # rank-1 vectors (layout.h check: arr.size() >= layout_rank, 1 vs 2).
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, k), 1)
    out = jnp.zeros((c, k), jnp.int32)
    for kk in range(k):
        m = jnp.min(jnp.min(cand, axis=2), axis=1, keepdims=True)  # [C,1]
        out = jnp.where(lane == kk, m, out)              # broadcast-select
        cand = jnp.where(cand == m[:, :, None], n, cand)
    idx_ref[0] = out                                     # [C,K]


def _nms_mask_kernel(thre_ref, blurred_ref, mask_ref, rowcnt_ref):
    """One frame's [C,H,W] blurred maps -> u8 NMS mask + per-row counts.

    Unlike :func:`_nms_first_k_kernel` this keeps the (sequential,
    measured-slower) K min-extractions OUT of the kernel: only the
    bandwidth-bound part moves to VMEM — the XLA epilogue's two f32
    reduce-window pools + mask compare + row-count reduce re-read the
    blurred maps ~5x from HBM (~7ms/step on the B=192 body program); here
    they are read once and only the u8 mask + s32 counts go back.
    """
    b = blurred_ref[0]                                   # [C,H,W] f32
    thre = thre_ref[0, 0]
    # 4-neighbour plateau NMS, out-of-image neighbours compare as 0
    # (islx.ops.peaks._nms_mask semantics; exact for any thre1 > 0)
    zrow = jnp.zeros_like(b[:, :1, :])
    zcol = jnp.zeros_like(b[:, :, :1])
    up = jnp.concatenate([zrow, b[:, :-1, :]], axis=1)
    down = jnp.concatenate([b[:, 1:, :], zrow], axis=1)
    left = jnp.concatenate([zcol, b[:, :, :-1]], axis=2)
    right = jnp.concatenate([b[:, :, 1:], zcol], axis=2)
    mask = ((b >= up) & (b >= down) & (b >= left) & (b >= right)
            & (b > thre))
    mask_ref[0] = mask.astype(jnp.uint8)
    rowcnt_ref[0] = mask.astype(jnp.int32).sum(axis=2)   # [C,H]


@functools.partial(jax.jit, static_argnums=(2,))
def nms_mask_rows(blurred_bchw: jax.Array, thre1: jax.Array,
                  interpret: bool = False):
    """blurred [B,C,H,W] f32 -> (mask u8 [B,C,H,W], row_cnt s32 [B,C,H]).

    Drop-in for ``_nms_mask`` + the row-count reduce of
    ``_first_k_masked_rows`` (islx.ops.peaks); the selection itself stays
    the XLA row-blocked chain.
    """
    bsz, c, h, w = blurred_bchw.shape
    mem = pltpu.ANY if interpret else pltpu.VMEM
    thre = jnp.reshape(thre1.astype(jnp.float32), (1, 1))
    return pl.pallas_call(
        _nms_mask_kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=mem),
        ],
        out_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, c, h), lambda i: (i, 0, 0),
                         memory_space=mem),
        ],
        out_shape=[jax.ShapeDtypeStruct((bsz, c, h, w), jnp.uint8),
                   jax.ShapeDtypeStruct((bsz, c, h), jnp.int32)],
        interpret=interpret,
    )(thre, blurred_bchw)


@functools.partial(jax.jit, static_argnums=(2, 3))
def nms_first_k(blurred_bchw: jax.Array, thre1: jax.Array, k: int,
                interpret: bool = False) -> jax.Array:
    """blurred [B,C,H,W] f32, thre1 scalar -> idx [B,C,K] int32.

    idx[b,c] = ascending flat (y*W+x) indices of the first k NMS peaks of
    channel c (sentinel H*W beyond the channel's peak count) — drop-in for
    ``_first_k_masked(_nms_mask(...))`` on TPU.
    """
    bsz, c, h, w = blurred_bchw.shape
    mem = pltpu.ANY if interpret else pltpu.VMEM
    # scalars must be 2D (1,1) in SMEM (pallas_guide: pitfall 8; a 1-D SMEM
    # operand crashed the Mosaic layout pass on TPU)
    thre = jnp.reshape(thre1.astype(jnp.float32), (1, 1))
    return pl.pallas_call(
        _nms_first_k_kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, c, k), lambda i: (i, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((bsz, c, k), jnp.int32),
        interpret=interpret,
    )(thre, blurred_bchw)
