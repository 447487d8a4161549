"""Hand keypoint extraction: blur + threshold + connected components, on device.

Replaces the reference's per-part host loop (src/hand.py:59-73: scipy blur,
``skimage.measure.label`` with 8-connectivity, per-component score sums,
``util.npmax``) with one jitted program over all 21 parts.

Connected components run as min-label propagation: every foreground pixel
starts labelled with its own flat index, and each iteration takes the minimum
label over its 3x3 neighbourhood (8-connectivity, matching skimage
``connectivity=2``) followed by a pointer-jump (``lab = lab[lab]``), which
makes convergence logarithmic in component diameter. Because labels are flat
row-major indices, a component's final label is its first pixel in scan order
— the same discovery order skimage uses — so the argmax-by-component-sum
tie-break (src/hand.py:68: first max in label order) is preserved.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from islx.ops.blur import gaussian_blur


class HandPeaks(NamedTuple):
    """xy: [C,2] int32 (x, y); (0,0) when a part has no pixel above threshold
    (src/hand.py:64-65 sentinel)."""

    xy: jax.Array
    found: jax.Array  # [C] bool


def _label_components(binary: jax.Array) -> jax.Array:
    """binary [H,W] bool -> int32 labels (flat index of component's first
    pixel); background = H*W sentinel."""
    h, w = binary.shape
    hw = h * w
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    sentinel = jnp.int32(hw)
    lab = jnp.where(binary, idx, sentinel)

    def min3x3(x):
        return -jax.lax.reduce_window(
            -x, -sentinel, jax.lax.max, (3, 3), (1, 1),
            [(1, 1), (1, 1)])

    def body(state):
        lab, _ = state
        new = jnp.where(binary, min3x3(lab), sentinel)
        # pointer jump: adopt the label of the pixel we currently point at
        flat = new.reshape(-1)
        safe = jnp.where(flat < hw, flat, 0)
        jumped = jnp.where(flat < hw, flat[safe], sentinel).reshape(h, w)
        new = jnp.where(binary, jnp.minimum(new, jumped), sentinel)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], body, (lab, jnp.bool_(True)))
    return lab


def _one_part(map_ori: jax.Array, blurred: jax.Array, thre: float):
    """map_ori/blurred: [H,W] -> ((x, y) int32, found bool)."""
    h, w = map_ori.shape
    hw = h * w
    binary = blurred > thre
    found = jnp.any(binary)

    lab = _label_components(binary)
    flat_lab = lab.reshape(-1)
    flat_map = map_ori.reshape(-1)
    # per-component sums of the UNBLURRED map (src/hand.py:68)
    sums = jax.ops.segment_sum(
        jnp.where(flat_lab < hw, flat_map, 0.0),
        jnp.minimum(flat_lab, hw), num_segments=hw + 1)
    is_root = (flat_lab == jnp.arange(hw, dtype=jnp.int32)) & binary.reshape(-1)
    root_sums = jnp.where(is_root, sums[:hw], -jnp.inf)
    best = jnp.argmax(root_sums)  # first max in scan order == skimage order

    in_comp = flat_lab == best
    masked = jnp.where(in_comp, flat_map, 0.0)
    peak = jnp.argmax(masked)  # first row-major max == util.npmax semantics
    y = (peak // w).astype(jnp.int32)
    x = (peak % w).astype(jnp.int32)
    xy = jnp.where(found, jnp.stack([x, y]), jnp.zeros(2, jnp.int32))
    return xy, found


@functools.partial(jax.jit, static_argnums=(1, 2))
def find_hand_peaks(heatmap: jax.Array, thre: float = 0.05,
                    sigma: float = 3.0) -> HandPeaks:
    """heatmap: [H,W,C] averaged hand heatmaps (first 21 channels are parts)."""
    blurred = gaussian_blur(heatmap, sigma)
    xy, found = jax.vmap(
        lambda m, b: _one_part(m, b, thre), in_axes=(2, 2))(heatmap, blurred)
    return HandPeaks(xy=xy, found=found)
