"""Pose-net training: CPM heatmap/PAF regression, data-parallel over a mesh.

The reference freezes all pose parameters and ships no training
(src/model.py:167-168,298-299,391-392 set requires_grad=False); islx makes
the trunks trainable: standard OpenPose-style supervision — MSE between
predicted and target heatmaps/PAFs at network resolution — with batches
sharded along the mesh ``data`` axis and gradients psum-reduced by XLA.

Intended uses: fine-tuning converted checkpoints on domain video (signers,
lighting), or training from scratch on COCO-format keypoint data prepared by
the user.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from islx.models import cpm
from islx.parallel import mesh as M


class PoseTrainState(NamedTuple):
    params: cpm.Params
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(lr)


def _weighted_heat_mse(heat: jax.Array, heat_t: jax.Array,
                       pos_weight: float) -> jax.Array:
    """MSE with joint cells upweighted by ``1 + pos_weight * target``.

    Gaussian joint targets are SPARSE (a few hot cells per /8 grid of
    hundreds), so uniform MSE lets the all-zeros prediction reach a tiny
    loss without ever localizing — the round-5 diagnosis of the synthetic
    hand bundle (raw demo response max 0.0575, argmax uncorrelated with
    GT). The weight applies to the joint channels only; the background
    channel (last, ~1 in empty cells) keeps weight 1, otherwise it would
    dominate even harder. pos_weight=0 is the plain MSE."""
    if pos_weight == 0.0:
        return jnp.mean((heat - heat_t) ** 2)
    w = 1.0 + pos_weight * heat_t.at[..., -1].set(0.0)
    return jnp.mean(w * (heat - heat_t) ** 2)


def loss_fn(params: cpm.Params, x: jax.Array, heat_t: jax.Array,
            paf_t: jax.Array, model_type: str,
            compute_dtype=jnp.bfloat16, pos_weight: float = 0.0,
            deep_supervision: bool = False) -> Tuple[jax.Array, Dict]:
    """x [B,H,W,3] normalized; targets at net resolution [B,H/8,W/8,C].

    deep_supervision (hand only): drive EVERY CPM stage head toward the
    target (the reference-family training recipe) — required for the
    stage-trim knob to consume a trained intermediate head, and it fixes
    gradient flow through the 6-stage refinement chain."""
    if model_type == "hand":
        if deep_supervision:
            outs = cpm.hand_forward_stages(params, x, compute_dtype)
            heat_loss = sum(_weighted_heat_mse(h, heat_t, pos_weight)
                            for h in outs) / len(outs)
        else:
            heat = cpm.hand_forward(params, x, compute_dtype)
            heat_loss = _weighted_heat_mse(heat, heat_t, pos_weight)
        return heat_loss, {"loss": heat_loss, "heat_loss": heat_loss}
    paf, heat = cpm.FORWARDS[model_type](params, x, compute_dtype)
    heat_loss = _weighted_heat_mse(heat, heat_t, pos_weight)
    if pos_weight == 0.0:
        paf_loss = jnp.mean((paf - paf_t) ** 2)
    else:   # PAF targets are sparse along limbs; weight by magnitude
        wp = 1.0 + pos_weight * jnp.abs(paf_t)
        paf_loss = jnp.mean(wp * (paf - paf_t) ** 2)
    loss = heat_loss + paf_loss
    return loss, {"loss": loss, "heat_loss": heat_loss, "paf_loss": paf_loss}


def make_train_step(optimizer: optax.GradientTransformation,
                    model_type: str = "body25", mesh=None,
                    compute_dtype=jnp.bfloat16, pos_weight: float = 0.0,
                    deep_supervision: bool = False):
    """step(state, x, heat_t, paf_t) -> (state, metrics); dp-sharded with a
    mesh (params replicated, batch along the data axis). pos_weight
    upweights sparse positive target cells (see _weighted_heat_mse);
    deep_supervision drives every hand-CPM stage head (loss_fn)."""

    def step(state: PoseTrainState, x, heat_t, paf_t):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, x, heat_t, paf_t,
                                      model_type, compute_dtype, pos_weight,
                                      deep_supervision)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return PoseTrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step)
    data = M.batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, data, data, data),
                   out_shardings=None)


def init_state(model_type: str = "body25",
               optimizer: Optional[optax.GradientTransformation] = None,
               key: Optional[jax.Array] = None
               ) -> Tuple[PoseTrainState, optax.GradientTransformation]:
    optimizer = optimizer or make_optimizer()
    params = cpm.init_params(model_type, key)
    return PoseTrainState(params, optimizer.init(params), jnp.int32(0)), \
        optimizer


def gaussian_heatmap_targets(keypoints: np.ndarray, visible: np.ndarray,
                             h8: int, w8: int, stride: int = 8,
                             sigma: float = 7.0) -> np.ndarray:
    """Ground-truth heatmaps from keypoint annotations.

    keypoints [B,C,2] (x, y) in input-pixel coords; visible [B,C] bool ->
    [B,h8,w8,C+1] with the standard background channel = 1 - max(joints).
    """
    b, c = keypoints.shape[:2]
    yy, xx = np.mgrid[0:h8, 0:w8].astype(np.float32)
    grid_x = xx * stride + stride / 2 - 0.5
    grid_y = yy * stride + stride / 2 - 0.5
    out = np.zeros((b, h8, w8, c + 1), np.float32)
    for i in range(b):
        for j in range(c):
            if not visible[i, j]:
                continue
            d2 = ((grid_x - keypoints[i, j, 0]) ** 2
                  + (grid_y - keypoints[i, j, 1]) ** 2)
            out[i, :, :, j] = np.maximum(out[i, :, :, j],
                                         np.exp(-d2 / (2 * sigma ** 2)))
        out[i, :, :, c] = 1.0 - out[i, :, :, :c].max(axis=-1)
    return out


def pose_targets(kp: np.ndarray, vis: np.ndarray, h8: int, w8: int,
                 model_type: str = "body25", sigma: float = 7.0):
    """Multi-person keypoint annotations -> supervision in the NET's layout.

    kp [P,J,2] input-pixel (x,y) for P people, vis [P,J] bool ->
    (heat [h8,w8,J+1], paf [h8,w8,npaf] | None). Heatmaps are max-combined
    across people with the background channel last; body-model PAFs are
    unit-vector fields in the net's MAP_IDX channel layout, count-averaged
    where people overlap (the OpenPose GT rule). Hand returns heat only.
    """
    from islx.ops.paf import LIMB_TABLES

    p, j = kp.shape[:2]
    heats = [gaussian_heatmap_targets(kp[i][None], vis[i][None], h8, w8,
                                      sigma=sigma) for i in range(p)]
    joint = np.max(np.stack([h[0, :, :, :j] for h in heats]), axis=0)
    bg = 1.0 - joint.max(-1)
    heat = np.concatenate([joint, bg[..., None]], -1)
    if model_type == "hand":
        return heat, None

    limb_seq, map_idx = LIMB_TABLES[model_type]
    npaf = {"body25": 52, "coco": 38}[model_type]
    paf = np.zeros((h8, w8, npaf), np.float32)
    cnt = np.zeros((h8, w8, npaf // 2), np.int32)
    for i in range(p):
        limbs = np.stack([np.stack([kp[i, a], kp[i, b]])
                          for a, b in limb_seq.tolist()])
        valid = np.array([vis[i, a] and vis[i, b]
                          for a, b in limb_seq.tolist()])
        t = paf_targets(limbs[None], valid[None], h8, w8)[0]
        for k in range(len(limb_seq)):
            c0, c1 = int(map_idx[k, 0]), int(map_idx[k, 1])
            m = (t[:, :, 2 * k] != 0) | (t[:, :, 2 * k + 1] != 0)
            paf[:, :, c0] += np.where(m, t[:, :, 2 * k], 0)
            paf[:, :, c1] += np.where(m, t[:, :, 2 * k + 1], 0)
            cnt[:, :, c0 // 2] += m
    denom = np.maximum(np.repeat(cnt, 2, axis=2), 1)
    return heat, paf / denom


def paf_targets(limbs_xy: np.ndarray, valid: np.ndarray, h8: int, w8: int,
                stride: int = 8, width: float = 1.0) -> np.ndarray:
    """Ground-truth PAFs from limb segments.

    limbs_xy [B,L,2,2] ((x1,y1),(x2,y2)) input-pixel coords; valid [B,L] ->
    [B,h8,w8,2L] unit vectors within ``width`` cells of each segment.
    """
    b, l = limbs_xy.shape[:2]
    yy, xx = np.mgrid[0:h8, 0:w8].astype(np.float32)
    gx = xx + 0.5
    gy = yy + 0.5
    out = np.zeros((b, h8, w8, 2 * l), np.float32)
    for i in range(b):
        for k in range(l):
            if not valid[i, k]:
                continue
            (x1, y1), (x2, y2) = limbs_xy[i, k] / stride
            dx, dy = x2 - x1, y2 - y1
            norm = max(np.hypot(dx, dy), 1e-6)
            ux, uy = dx / norm, dy / norm
            # distance from each cell to the segment
            t = np.clip(((gx - x1) * ux + (gy - y1) * uy) / norm, 0, 1)
            px, py = x1 + t * norm * ux, y1 + t * norm * uy
            d = np.hypot(gx - px, gy - py)
            m = d <= width
            out[i, :, :, 2 * k] = np.where(m, ux, out[i, :, :, 2 * k])
            out[i, :, :, 2 * k + 1] = np.where(m, uy, out[i, :, :, 2 * k + 1])
    return out
