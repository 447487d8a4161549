"""Fine-tune CPM pose nets on keypoint-annotated samples.

The reference freezes every pose parameter (its CPMs were trained upstream
in Caffe and shipped as download-only checkpoints — /root/reference/README.md:43-54,
src/body.py:240) — islx closes the loop. This CLI fine-tunes body25/coco/hand
CPMs from simple .npz samples:

    python -m islx.cli.pose_train DATA_DIR --model-type body25 --out W.npz
           [--init W0.npz] [--epochs 5] [--batch 8] [--lr 1e-4] [--size 184]
           [--mesh-data N]          # data-parallel over an N-chip mesh
           [--pipeline N]           # GPipe over N devices (islx.parallel.pipeline)

Sample format, one .npz per image:
    image      u8  [H,W,3] BGR
    keypoints  f32 [P,J,2] (x,y) input-pixel coords (P people; [J,2] ok)
    visible    bool [P,J] (or [J])

Targets are derived on host (islx.models.pose_train.pose_targets): gaussian
joint heatmaps (max-combined across people, background channel last) and —
for body models — unit-vector PAFs in the net's MAP_IDX channel layout.

Parallelism: ``--mesh-data N`` shards the batch over a device mesh
(pose_train.make_train_step in_shardings); ``--pipeline N`` splits the CPM
into N param-balanced pipeline segments on N devices and trains with
GPipe-accumulated gradients (equal to the full-batch gradient —
tests/test_parallel.py), for nets too large for one device's memory.
"""
from __future__ import annotations

import argparse
import glob
import os


def load_samples(data_dir: str, size: int, model_type: str):
    """(x [N,size,size,3] f32 normalized, heat_t, paf_t|zeros) from npz dir."""
    import cv2
    import numpy as np

    from islx.models import pose_train as PT

    paths = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
    if not paths:
        raise SystemExit(f"no .npz samples under {data_dir}")
    h8 = w8 = size // 8
    xs, heats, pafs = [], [], []
    for p in paths:
        d = np.load(p)
        img, kp = d["image"], np.asarray(d["keypoints"], np.float32)
        vis = np.asarray(d["visible"], bool)
        if kp.ndim == 2:
            kp, vis = kp[None], vis[None]
        sy, sx = size / img.shape[0], size / img.shape[1]
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
        kp = kp * np.array([sx, sy], np.float32)
        heat, paf = PT.pose_targets(kp, vis, h8, w8, model_type)
        xs.append(img.astype(np.float32) / 256.0 - 0.5)
        heats.append(heat)
        pafs.append(paf if paf is not None
                    else np.zeros((h8, w8, 0), np.float32))
    return (np.stack(xs), np.stack(heats), np.stack(pafs))


def _epoch_order(n: int, b: int, seed: int, log=None):
    """Per-epoch sample permutation. With n % b != 0 a fixed order would
    silently drop the SAME tail samples every epoch (ADVICE r4 — e.g. 9
    samples at --batch 8 never trains sample 9); shuffling rotates the
    dropped tail across epochs and the warning makes it visible."""
    import numpy as np

    if log is not None and n % b:
        log(f"note: {n} samples % batch {b} leaves {n % b}/epoch out; "
            "per-epoch shuffling rotates which ones")
    return np.random.RandomState(seed).permutation(n)


def _train_pipeline(params, x, heat_t, paf_t, args, log):
    """GPipe path: per-segment params stay on their devices; one optax
    state per segment; PipelinedCPM.grads == the full-batch gradient."""
    import jax
    import jax.numpy as jnp
    import optax

    from islx.parallel.pipeline import PipelinedCPM

    devices = jax.devices()[:args.pipeline]
    if len(devices) < args.pipeline:
        raise SystemExit(f"--pipeline {args.pipeline} but only "
                         f"{len(devices)} devices visible")
    dt = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    pipe = PipelinedCPM(params, args.model_type, devices, dt)
    opt = optax.adam(args.lr)
    opt_states = [opt.init(seg["params"]) for seg in pipe.segments]
    n = x.shape[0]
    b = min(args.batch, n)
    targets = ((jnp.asarray(heat_t),) if args.model_type == "hand"
               else (jnp.asarray(paf_t), jnp.asarray(heat_t)))
    for ep in range(args.epochs):
        order = _epoch_order(n, b, getattr(args, 'seed', 0) + ep,
                             log if ep == 0 else None)
        for i0 in range(0, n - b + 1, b):
            sl = order[i0:i0 + b]
            loss, gseg = pipe.grads(jnp.asarray(x[sl]),
                                    tuple(t[sl] for t in targets))
            for s, (seg, g) in enumerate(zip(pipe.segments, gseg)):
                upd, opt_states[s] = opt.update(g, opt_states[s],
                                                seg["params"])
                seg["params"] = jax.tree_util.tree_map(
                    lambda p, u: p + u, seg["params"], upd)
        log(f"epoch {ep} loss {float(loss):.5f} "
            f"({args.pipeline} pipeline segments)")
    merged = {}
    for seg in pipe.segments:
        merged.update(seg["params"])
    return merged


def _train_flat(params, x, heat_t, paf_t, args, log):
    """Single-chip or data-parallel mesh path (pose_train.make_train_step)."""
    import jax.numpy as jnp

    from islx.models import pose_train as PT

    mesh = None
    if args.mesh_data:
        from islx.parallel import mesh as M

        mesh = M.make_mesh(n_data=args.mesh_data)
    dt = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    opt = PT.make_optimizer(args.lr)
    state = PT.PoseTrainState(params, opt.init(params), jnp.int32(0))
    step = PT.make_train_step(opt, args.model_type, mesh=mesh,
                              compute_dtype=dt)
    n = x.shape[0]
    b = min(args.batch, n)
    for ep in range(args.epochs):
        order = _epoch_order(n, b, getattr(args, 'seed', 0) + ep,
                             log if ep == 0 else None)
        for i0 in range(0, n - b + 1, b):
            sl = order[i0:i0 + b]
            state, metrics = step(state, x[sl], heat_t[sl], paf_t[sl])
        log(f"epoch {ep} loss {float(metrics['loss']):.5f}"
            + (f" (mesh data={args.mesh_data})" if mesh else ""))
    return state.params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir")
    p.add_argument("--model-type", default="body25",
                   choices=["body25", "coco", "hand"])
    p.add_argument("--out", required=True, help="output checkpoint (.npz)")
    p.add_argument("--init", default=None,
                   help="starting weights (.npz/.pt/.caffemodel; "
                        "default: fresh init)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--size", type=int, default=184,
                   help="training resolution (multiple of 8)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel mesh axis (0 = no mesh)")
    p.add_argument("--pipeline", type=int, default=0,
                   help="GPipe pipeline-parallel over N devices "
                        "(0 = no pipeline; exclusive with --mesh-data)")
    args = p.parse_args(argv)
    if args.size % 8:
        p.error("--size must be a multiple of 8")
    if args.pipeline and args.mesh_data:
        p.error("--pipeline and --mesh-data are exclusive")

    import jax

    from islx.core import weights as W
    from islx.models import cpm

    x, heat_t, paf_t = load_samples(args.data_dir, args.size,
                                    args.model_type)
    print(f"{x.shape[0]} samples at {args.size}px")
    if args.init:
        params = W.load(args.init, args.model_type)
    else:
        params = cpm.init_params(args.model_type,
                                 jax.random.PRNGKey(args.seed))
    train = _train_pipeline if args.pipeline else _train_flat
    params = train(params, x, heat_t, paf_t, args, print)
    W.save_npz(args.out, params)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
