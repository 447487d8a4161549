"""Pallas TPU kernel: connected-component min-label propagation.

The exact hand-peak path labels thresholded blobs by iterated 3x3 min
propagation (islx.ops.hand_peaks._label_components). The XLA version runs
one reduce_window per sweep with an HBM round trip between sweeps; this
Pallas kernel keeps the whole label map in VMEM and runs ALL sweeps to
convergence inside one kernel invocation — the map is touched in HBM exactly
twice (load + store).

Grid: one program per channel. Each program:
  1. initializes labels = flat row-major index where binary else sentinel
  2. sweeps: label <- min over 3x3 neighbourhood (masked to foreground),
     expressed as whole-array shifted mins on the VPU
  3. stops at a fixpoint (checked every CHECK_EVERY sweeps to amortize the
     reduction)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHECK_EVERY = 8


def _cc_kernel(binary_ref, labels_ref):
    h, w = binary_ref.shape[1], binary_ref.shape[2]
    sentinel = jnp.int32(h * w)
    binary = binary_ref[0] != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    labels = jnp.where(binary, row * w + col, sentinel)

    def shift_min(x):
        # min over the 3x3 neighbourhood via 2 axis-shift mins per axis
        up = jnp.concatenate([x[:1], x[:-1]], axis=0)
        dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
        v = jnp.minimum(jnp.minimum(up, dn), x)
        lf = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
        rt = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
        return jnp.minimum(jnp.minimum(lf, rt), v)

    def sweep(x):
        return jnp.where(binary, shift_min(x), sentinel)

    def body(state):
        x, _ = state
        y = x
        for _ in range(CHECK_EVERY):
            y = sweep(y)
        return y, jnp.any(y != x)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (labels, jnp.bool_(True)))
    labels_ref[0] = labels


@functools.partial(jax.jit, static_argnums=(1,))
def label_components_pallas(binary: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """binary [H,W,C] bool -> labels [H,W,C] int32 (sentinel H*W = background).

    Component label = flat row-major index of its first pixel (same contract
    as islx.ops.hand_peaks._label_components).
    """
    h, w, c = binary.shape
    b8 = binary.transpose(2, 0, 1).astype(jnp.int32)   # [C,H,W]
    out = pl.pallas_call(
        _cc_kernel,
        grid=(c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.int32),
        interpret=interpret,
    )(b8)
    return out.transpose(1, 2, 0)
