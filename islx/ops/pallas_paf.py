"""Pallas TPU kernel: exact PAF line-integral scoring.

The parity path samples the full-resolution PAF at 10 rounded points per
candidate pair (islx.ops.paf.score_limbs — reference src/body.py:149-164).
XLA lowers those lookups to HBM gathers, which run near scalar speed on TPU.
This kernel expresses the sample lookup as a tiled one-hot contraction that
never leaves VMEM: per (limb, cell-tile) grid step it builds the one-hot
matrix [samples, tile] from integer compares (VPU) and contracts it with the
limb's PAF tile on the MXU, accumulating [samples, 2] in VMEM. No scalar
loads/stores (Mosaic rejects those), no HBM gathers.

The pair geometry (norms, unit vectors, sample coordinates) is precomputed as
vectorized XLA ops outside the kernel; the dot with unit vectors and the
acceptance criteria also stay in XLA (vectorized and cheap). Numerics are
identical to score_limbs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from islx.ops.paf import LimbScores

_TILE = 512  # PAF cells per grid step (lane-aligned; [n,512] one-hot in VMEM)


def _sample_kernel(coords_ref, paf_ref, out_ref, *, w: int, tile: int):
    j = pl.program_id(1)
    xy = coords_ref[0]                                   # [n, 2] int32
    cell = xy[:, 1] * w + xy[:, 0]                       # [n]
    cell_ids = j * tile + jax.lax.broadcasted_iota(
        jnp.int32, (1, tile), 1)                         # [1, tile]
    onehot = (cell[:, None] == cell_ids).astype(jnp.float32)   # [n, tile]
    # HIGHEST precision: the one-hot contraction must return the exact f32
    # PAF values (default TPU matmul precision rounds operands to bf16)
    part = jnp.dot(onehot, paf_ref[0],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # [n, 2]

    @pl.when(j == 0)
    def _init():
        out_ref[0] = part

    @pl.when(j > 0)
    def _acc():
        out_ref[0] += part


def _gather_paf_pallas(paf_pairs: jax.Array, coords: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """paf_pairs [L,H,W,2] f32, coords [L,N,2] int32 -> [L,N,2] samples."""
    l, h, w, _ = paf_pairs.shape
    n = coords.shape[1]
    cells = h * w
    n_tiles = -(-cells // _TILE)
    pad = n_tiles * _TILE - cells
    flat = paf_pairs.reshape(l, cells, 2).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    return pl.pallas_call(
        functools.partial(_sample_kernel, w=w, tile=_TILE),
        grid=(l, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n, 2), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, _TILE, 2), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, 2), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((l, n, 2), jnp.float32),
        interpret=interpret,
    )(coords, flat)


@functools.partial(jax.jit, static_argnums=(5, 6, 8))
def score_limbs_pallas(paf: jax.Array, peaks_xy: jax.Array,
                       peaks_valid: jax.Array, limb_seq: jax.Array,
                       map_idx: jax.Array, thre2: float = 0.05,
                       mid_num: int = 10, orig_h=None,
                       interpret: bool = False) -> LimbScores:
    """Drop-in exact replacement for islx.ops.paf.score_limbs.

    paf [H,W,P] full-resolution PAF; peaks_xy [C,K,2]; peaks_valid [C,K].
    """
    if orig_h is None:
        orig_h = paf.shape[0]
    orig_h = jnp.asarray(orig_h, jnp.float32)
    h, w = paf.shape[0], paf.shape[1]
    k = peaks_xy.shape[1]

    # geometry, vectorized in XLA (same math as score_limbs)
    a_xy = peaks_xy[limb_seq[:, 0]].astype(jnp.float32)       # [L,K,2]
    b_xy = peaks_xy[limb_seq[:, 1]].astype(jnp.float32)
    a_valid = peaks_valid[limb_seq[:, 0]]                      # [L,K]
    b_valid = peaks_valid[limb_seq[:, 1]]
    vec = b_xy[:, None, :, :] - a_xy[:, :, None, :]            # [L,K,K,2]
    norm = jnp.maximum(jnp.sqrt((vec * vec).sum(-1)), 0.001)
    unit = vec / norm[..., None]
    t = jnp.linspace(0.0, 1.0, mid_num)
    pts = (a_xy[:, :, None, None, :]
           + vec[:, :, :, None, :] * t[None, None, None, :, None])
    xi = jnp.clip(jnp.rint(pts[..., 0]), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.rint(pts[..., 1]), 0, h - 1).astype(jnp.int32)
    coords = jnp.stack([xi, yi], axis=-1).reshape(
        limb_seq.shape[0], k * k * mid_num, 2)

    # the limb's two PAF channels, gathered once per limb (L=24 cheap slices)
    paf_pairs = paf[:, :, map_idx].transpose(2, 0, 1, 3)       # [L,H,W,2]

    sampled = _gather_paf_pallas(paf_pairs, coords, interpret)
    sampled = sampled.reshape(limb_seq.shape[0], k, k, mid_num, 2)

    score_mid = (sampled * unit[:, :, :, None, :]).sum(-1)     # [L,K,K,mid]
    prior = jnp.minimum(0.5 * orig_h / norm - 1.0, 0.0)
    swdp = score_mid.mean(-1) + prior
    crit1 = (score_mid > thre2).sum(-1) > 0.8 * mid_num
    ok = (crit1 & (swdp > 0)
          & a_valid[:, :, None] & b_valid[:, None, :])
    return LimbScores(score=swdp, ok=ok)
