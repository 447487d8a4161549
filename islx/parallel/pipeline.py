"""Pipeline parallelism (GPipe-style microbatch pipelining) for CPM trunks.

The reference has no model parallelism at all (single-GPU torch modules,
src/model.py); islx's default for the 26-52M-param CPMs is replication
(SURVEY §2.3) with data parallelism. Pipeline parallelism covers the
remaining corner — memory-tight chips or param-heavy variants where a
trunk does NOT fit alongside its activations:

* the model's refinement stages are grouped into contiguous SEGMENTS,
  balanced by parameter bytes, one segment per device;
* each segment's parameters live ONLY on its device (the memory win —
  no replication);
* a batch is split into microbatches that flow device-to-device (ICI on
  real TPUs); JAX's per-device async dispatch queues overlap segment s on
  microbatch m with segment s+1 on microbatch m-1, giving GPipe-style
  bubble occupancy without a hand-written schedule;
* training gradients come from per-microbatch reverse passes accumulated
  across microbatches (GPipe semantics: identical to the full-batch
  gradient for mean-reduced losses).

Cells mirror the stage wiring of ``islx.models.cpm`` exactly (same
``_seq``/``_dense_block`` primitives), so a pipelined forward is
numerically identical to the single-device forward.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from islx.models import cpm

# A cell is (name, conv-names it owns, fn(params, state, dtype) -> state).
Cell = Tuple[str, List[str], Callable]
State = Dict[str, jax.Array]


def _names(node) -> List[str]:
    return [c.name for c in cpm._iter_convs(node)]


def _b25_run_stage(params, tout, s: int, L: str, dt):
    st = cpm._B25["stages"]
    for i in range(1, 6):
        tout = cpm._dense_block(tout, st[f"Mconv{i}_stage{s}_{L}"], params, dt)
    for c in st[f"Mconv6_7_stage{s}_{L}"]:
        tout = cpm._conv(tout, params[c.name], c, dt)
    return tout


def _b25_cells() -> List[Cell]:
    spec = cpm._B25
    st = spec["stages"]

    def stage_names(s: int, L: str) -> List[str]:
        return _names([st[f"Mconv{i}_stage{s}_{L}"] for i in range(1, 6)]
                      + [st[f"Mconv6_7_stage{s}_{L}"]])

    def trunk(p, state, dt):
        out0 = cpm._seq(state["x"], spec["trunk"], p, dt)
        return {"out0": out0, "tout": out0}

    def l2(s):
        def fn(p, state, dt):
            paf = _b25_run_stage(p, state["tout"], s, "L2", dt)
            return {"out0": state["out0"], "paf": paf,
                    "tout": jnp.concatenate([state["out0"], paf], axis=-1)}
        return fn

    def l1_0(p, state, dt):
        heat0 = _b25_run_stage(p, state["tout"], 0, "L1", dt)
        return {"paf": state["paf"],
                "tout": jnp.concatenate(
                    [state["out0"], heat0, state["paf"]], axis=-1)}

    def l1_1(p, state, dt):
        heat = _b25_run_stage(p, state["tout"], 1, "L1", dt)
        return {"paf": state["paf"], "heat": heat}

    cells: List[Cell] = [("trunk", _names(spec["trunk"]), trunk)]
    for s in range(4):
        cells.append((f"L2s{s}", stage_names(s, "L2"), l2(s)))
    cells.append(("L1s0", stage_names(0, "L1"), l1_0))
    cells.append(("L1s1", stage_names(1, "L1"), l1_1))
    return cells


def _coco_cells() -> List[Cell]:
    spec = cpm._COCO
    heads = spec["heads"]

    def trunk_b1(p, state, dt):
        out1 = cpm._seq(state["x"], spec["trunk"], p, dt)
        return {"out1": out1,
                "a": cpm._seq(out1, heads["block1_L1"], p, dt),
                "b": cpm._seq(out1, heads["block1_L2"], p, dt)}

    def block(i):
        def fn(p, state, dt):
            x2 = jnp.concatenate([state["a"], state["b"], state["out1"]],
                                 axis=-1)
            return {"out1": state["out1"],
                    "a": cpm._seq(x2, heads[f"block{i}_L1"], p, dt),
                    "b": cpm._seq(x2, heads[f"block{i}_L2"], p, dt)}
        return fn

    cells: List[Cell] = [("trunk_b1", _names(
        [spec["trunk"], heads["block1_L1"], heads["block1_L2"]]), trunk_b1)]
    for i in range(2, 7):
        cells.append((f"block{i}", _names(
            [heads[f"block{i}_L1"], heads[f"block{i}_L2"]]), block(i)))
    return cells


def _hand_cells() -> List[Cell]:
    spec = cpm._HAND

    def trunk_s1(p, state, dt):
        t = cpm._seq(state["x"], spec["trunk"], p, dt)
        return {"trunk": t, "out": cpm._seq(t, spec["stage1"], p, dt)}

    def stage(i):
        def fn(p, state, dt):
            x2 = jnp.concatenate([state["out"], state["trunk"]], axis=-1)
            return {"trunk": state["trunk"],
                    "out": cpm._seq(x2, spec["stages"][f"stage{i}"], p, dt)}
        return fn

    cells: List[Cell] = [("trunk_s1", _names(
        [spec["trunk"], spec["stage1"]]), trunk_s1)]
    for i in range(2, 7):
        cells.append((f"stage{i}", _names(spec["stages"][f"stage{i}"]),
                      stage(i)))
    return cells


CELLS = {"body25": _b25_cells, "coco": _coco_cells, "hand": _hand_cells}
# forward() return keys per model (order matches cpm.FORWARDS outputs)
OUT_KEYS = {"body25": ("paf", "heat"), "coco": ("a", "b"), "hand": ("out",)}


def _param_cost(model_type: str) -> Dict[str, int]:
    return {c.name: c.k * c.k * c.cin * c.cout
            for c in cpm.conv_layers(model_type)}


def _balance(cells: Sequence[Cell], costs: Dict[str, int],
             n_seg: int) -> List[List[Cell]]:
    """Contiguous partition of cells into n_seg groups minimizing the max
    group parameter cost (exact DP; cell counts are tiny)."""
    w = [sum(costs[n] for n in names) for _, names, _ in cells]
    n = len(cells)
    # best[k][i] = minimal max-cost partitioning cells[i:] into k groups
    INF = float("inf")
    best = [[INF] * (n + 1) for _ in range(n_seg + 1)]
    cut = [[0] * (n + 1) for _ in range(n_seg + 1)]
    best[0][n] = 0.0
    for k in range(1, n_seg + 1):
        for i in range(n - 1, -1, -1):
            acc = 0
            for j in range(i + 1, n + 1):
                acc += w[j - 1]
                v = max(acc, best[k - 1][j])
                if v < best[k][i]:
                    best[k][i], cut[k][i] = v, j
    groups, i = [], 0
    for k in range(n_seg, 0, -1):
        j = cut[k][i]
        groups.append(list(cells[i:j]))
        i = j
    assert i == n, (i, n)
    return groups


class PipelinedCPM:
    """A CPM trunk split into per-device pipeline segments.

    ``forward(x, n_micro)`` matches ``cpm.FORWARDS[model_type]`` exactly;
    ``grads(x, targets, n_micro)`` returns the GPipe-accumulated gradient
    of the mean-squared heatmap/PAF loss (the pose fine-tuning objective,
    islx.models.pose_train) with respect to every segment's parameters.
    """

    def __init__(self, params: cpm.Params, model_type: str,
                 devices: Sequence, compute_dtype=jnp.float32):
        cells = CELLS[model_type]()
        n_seg = len(devices)
        assert 1 <= n_seg <= len(cells), (n_seg, len(cells))
        self.model_type = model_type
        self.compute_dtype = compute_dtype
        self.devices = list(devices)
        groups = _balance(cells, _param_cost(model_type), n_seg)
        self.segments = []
        for dev, group in zip(self.devices, groups):
            names = [n for _, cell_names, _ in group for n in cell_names]
            seg_params = {n: jax.device_put(params[n], dev) for n in names}
            fns = [fn for _, _, fn in group]

            def make(fns):
                def seg_fn(p, state):
                    for f in fns:
                        state = f(p, state, self.compute_dtype)
                    return state
                return seg_fn

            fn = make(fns)
            self.segments.append(
                {"device": dev, "params": seg_params, "fn": fn,
                 "jit": jax.jit(fn), "cells": [c[0] for c in group]})

    def _micro(self, x: jax.Array, n_micro: int) -> List[jax.Array]:
        b = x.shape[0]
        assert b % n_micro == 0, (b, n_micro)
        return list(x.reshape((n_micro, b // n_micro) + x.shape[1:]))

    def _default_micro(self, b: int) -> int:
        """Largest divisor of b at most 2x the segment count (enough
        microbatches to fill the pipeline, no smaller than necessary)."""
        target = min(b, 2 * len(self.segments))
        return next(m for m in range(target, 0, -1) if b % m == 0)

    def _run_segments(self, state: State, params_per_seg=None,
                      jitted: bool = True) -> State:
        for i, seg in enumerate(self.segments):
            state = jax.device_put(state, seg["device"])
            p = seg["params"] if params_per_seg is None else params_per_seg[i]
            state = (seg["jit"] if jitted else seg["fn"])(p, state)
        return state

    def forward(self, x: jax.Array, n_micro: int = None):
        """x [B,H,W,3] -> same outputs as cpm.FORWARDS[model_type].

        All microbatches are DISPATCHED before any result is awaited, so
        segment s runs microbatch m while segment s+1 runs m-1 (JAX async
        dispatch provides the pipeline schedule)."""
        n_micro = n_micro or self._default_micro(x.shape[0])
        outs = [self._run_segments({"x": xm}) for xm in self._micro(x, n_micro)]
        keys = OUT_KEYS[self.model_type]
        result = tuple(jnp.concatenate([o[k] for o in outs]) for k in keys)
        return result if len(result) > 1 else result[0]

    def grads(self, x: jax.Array, targets, n_micro: int = None):
        """GPipe training: per-microbatch reverse passes, gradients averaged
        across microbatches -> (loss, [per-segment param grads]).

        targets: same structure as forward()'s output. Loss is the summed
        MSE over outputs (matches islx.models.pose_train's objective).
        """
        n_micro = n_micro or self._default_micro(x.shape[0])
        keys = OUT_KEYS[self.model_type]
        tg = targets if isinstance(targets, tuple) else (targets,)
        params = [seg["params"] for seg in self.segments]

        def loss_fn(params_per_seg, xm, tm):
            state = self._run_segments({"x": xm}, params_per_seg,
                                       jitted=False)
            return sum(jnp.mean(
                (state[k].astype(jnp.float32) - t) ** 2)
                for k, t in zip(keys, tm))

        vg = jax.value_and_grad(loss_fn)
        total_loss, total_grads = 0.0, None
        tms = [self._micro(t, n_micro) for t in tg]
        for m, xm in enumerate(self._micro(x, n_micro)):
            loss, g = vg(params, xm, tuple(t[m] for t in tms))
            total_loss = total_loss + loss
            total_grads = g if total_grads is None else jax.tree_util.tree_map(
                jnp.add, total_grads, g)
        scale = 1.0 / n_micro
        return (total_loss * scale,
                jax.tree_util.tree_map(lambda a: a * scale, total_grads))
