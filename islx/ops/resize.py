"""Bicubic resize with exact cv2 INTER_CUBIC semantics, as MXU matmuls.

The reference resizes with ``cv2.resize(..., INTER_CUBIC)`` at three points of
the pose pipeline (input pyramid src/body.py:53, x8 heatmap upsample
src/body.py:70,76, and back-to-original src/body.py:72,78). cv2's cubic kernel
is Catmull-Rom-like with A=-0.75 and half-pixel-centre coordinate mapping —
NOT the A=-0.5 Keys kernel of ``jax.image.resize`` — so we build the exact
interpolation weights ourselves.

TPU-first design: a separable resize is two small dense matmuls
(``R[hout,hin] @ img @ C[win,wout]``), which XLA tiles straight onto the MXU;
the weight matrices are tiny (rows x rows), built once per (in,out) pair on
host and cached. This turns the reference's serial cv2 calls into batched,
fused device ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # cv2's bicubic coefficient


def _cubic_coeffs(x: np.ndarray) -> np.ndarray:
    """cv2 interpolateCubic: 4 tap weights for fractional offset x in [0,1)."""
    A = _A
    w = np.empty(x.shape + (4,), np.float64)
    w[..., 0] = ((A * (x + 1) - 5 * A) * (x + 1) + 8 * A) * (x + 1) - 4 * A
    w[..., 1] = ((A + 2) * x - (A + 3)) * x * x + 1
    w[..., 2] = ((A + 2) * (1 - x) - (A + 3)) * (1 - x) * (1 - x) + 1
    w[..., 3] = 1.0 - w[..., 0] - w[..., 1] - w[..., 2]
    return w


@functools.lru_cache(maxsize=256)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense [n_out, n_in] cubic interpolation matrix (border replicate)."""
    scale = n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    w = _cubic_coeffs(frac)  # [n_out, 4]
    mat = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    for t in range(4):
        cols = np.clip(i0 - 1 + t, 0, n_in - 1)
        np.add.at(mat, (rows, cols), w[:, t].astype(np.float32))
    return mat


def cv2_round(x: float) -> int:
    """cvRound: round half to even (cv2 uses it for fx/fy -> dsize)."""
    return int(np.rint(x))


def output_size(size: int, f: float) -> int:
    return cv2_round(size * f)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _resize_hwc(img: jax.Array, h_out: int, w_out: int) -> jax.Array:
    h_in, w_in = img.shape[0], img.shape[1]
    r = jnp.asarray(_resize_matrix(h_in, h_out))
    c = jnp.asarray(_resize_matrix(w_in, w_out))
    x = img.astype(jnp.float32)
    # HIGHEST precision: interpolation must stay f32 even on TPU (default
    # matmul precision is bf16, which costs ~1e-2 absolute error — enough to
    # move keypoints).
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,hwc->owc", r, x, precision=hi)
    x = jnp.einsum("pw,owc->opc", c, x, precision=hi)
    return x


def resize_cubic(img: jax.Array, h_out: int, w_out: int,
                 saturate_uint8: bool = False) -> jax.Array:
    """Resize [...,H,W,C] (channel-last) to (h_out, w_out), cv2-INTER_CUBIC exact.

    Works on any leading batch dims; returns float32. With
    ``saturate_uint8=True`` the result is rounded (half-to-even) and clamped
    to [0,255], reproducing cv2's uint8 resize path (saturate_cast<uchar>) —
    use this when emulating the reference's u8 input-image resizes.
    """
    if img.ndim == 3:
        out = _resize_hwc(img, h_out, w_out)
    else:
        lead = img.shape[:-3]
        flat = img.reshape((-1,) + img.shape[-3:])
        out = jax.vmap(lambda x: _resize_hwc(x, h_out, w_out))(flat)
        out = out.reshape(lead + out.shape[1:])
    if saturate_uint8:
        out = jnp.clip(jnp.rint(out), 0.0, 255.0)
    return out


def resize_by_factor(img: jax.Array, fy: float, fx: float,
                     saturate_uint8: bool = False) -> jax.Array:
    """cv2.resize(img, (0,0), fx, fy, INTER_CUBIC) equivalent."""
    h_out = output_size(img.shape[-3], fy)
    w_out = output_size(img.shape[-2], fx)
    return resize_cubic(img, h_out, w_out, saturate_uint8)


def _cubic_weight(t: jax.Array) -> jax.Array:
    """cv2 bicubic kernel value at (possibly traced) offset t (A=-0.75)."""
    a = jnp.abs(t)
    w1 = ((_A + 2) * a - (_A + 3)) * a * a + 1            # |t| < 1
    w2 = ((_A * a - 5 * _A) * a + 8 * _A) * a - 4 * _A    # 1 <= |t| < 2
    return jnp.where(a < 1, w1, jnp.where(a < 2, w2, 0.0))


def _dynamic_axis_matrix(n_in: int, out_size: int, start: jax.Array,
                         width: jax.Array) -> jax.Array:
    """[out_size, n_in] cubic interpolation matrix for a DYNAMIC crop
    [start, start+width) resized to out_size — built on device.

    TPU-native crop-and-resize: instead of dynamic_slice + per-pixel gathers
    (slow on TPU), the whole operation becomes a dense matmul with a weight
    matrix computed on the fly from traced (start, width) scalars. Exact cv2
    semantics: src = start + (j+0.5)*width/out - 0.5, 4 taps, border
    replicate (taps clamp into the crop; weights fold onto the edge).
    """
    start = start.astype(jnp.float32)
    width = width.astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.float32, (out_size, 1), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (1, n_in), 1)
    src = start + (j + 0.5) * width / out_size - 0.5      # [out,1]
    base = jnp.floor(src)
    lo = start
    hi = start + width - 1.0
    mat = jnp.zeros((out_size, n_in), jnp.float32)
    for d in range(-1, 3):
        tap = base + d
        wgt = _cubic_weight(src - tap)                     # [out,1]
        clamped = jnp.clip(tap, lo, hi)                    # replicate border
        mat = mat + wgt * (i == clamped)
    return mat


def dynamic_crop_resize_batch(frames: jax.Array, fidx: jax.Array,
                              x0: jax.Array, y0: jax.Array, w: jax.Array,
                              out_size: int,
                              saturate_uint8: bool = True) -> jax.Array:
    """Batched crop-and-resize: frames [B,H,W,C], per-crop (fidx, x0, y0, w)
    vectors [N] -> crops [N,out,out,C] f32. Same cv2-exact semantics as
    :func:`dynamic_crop_resize`, but expressed as ONE frame gather plus two
    batched matmuls instead of N vmapped dynamic-slice programs — the
    all-batched form compiles to two fused MXU calls and avoids the
    sequential ``lax.map`` chunking the per-crop form needed for
    compile-time control.
    """
    h, wd = frames.shape[1], frames.shape[2]
    ry = jax.vmap(lambda a, b: _dynamic_axis_matrix(h, out_size, a, b)
                  )(y0, w)                                   # [N, out, H]
    rx = jax.vmap(lambda a, b: _dynamic_axis_matrix(wd, out_size, a, b)
                  )(x0, w)                                   # [N, out, W]
    src = frames[fidx].astype(jnp.float32)                   # [N, H, W, C]
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("noh,nhwc->nowc", ry, src, precision=hi)
    x = jnp.einsum("npw,nowc->nopc", rx, x, precision=hi)
    if saturate_uint8:
        x = jnp.clip(jnp.rint(x), 0.0, 255.0)
    return x


def dynamic_crop_resize(img: jax.Array, x0: jax.Array, y0: jax.Array,
                        w: jax.Array, out_size: int,
                        saturate_uint8: bool = True) -> jax.Array:
    """Crop img[y0:y0+w, x0:x0+w] and cubic-resize to (out_size, out_size).

    img: [H,W,C]; x0/y0/w: traced int scalars. Equivalent to
    ``resize_cubic(img[y0:y0+w, x0:x0+w], out, out, saturate_uint8)`` but
    with dynamic coordinates and no gathers — two MXU matmuls.
    """
    h, wd = img.shape[0], img.shape[1]
    ry = _dynamic_axis_matrix(h, out_size, y0, w)
    rx = _dynamic_axis_matrix(wd, out_size, x0, w)
    hi = jax.lax.Precision.HIGHEST
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,hwc->owc", ry, x, precision=hi)
    x = jnp.einsum("pw,owc->opc", rx, x, precision=hi)
    if saturate_uint8:
        x = jnp.clip(jnp.rint(x), 0.0, 255.0)
    return x
