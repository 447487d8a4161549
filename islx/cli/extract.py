"""Dataset feature extraction CLI (reference extract_features*.py family).

    python -m islx.cli.extract CSV OUT_DIR [--shard-index I --num-shards N]
           [--body-weights W] [--hand-weights W] [--sticks]

Shard across machines/processes by launching one process per (I, N) pair —
the deterministic-partition replacement for the reference's mp.Process +
Queue orchestration (extract_features_mp.py:156-239).
"""
from __future__ import annotations

import argparse


def _first_video(csv_path: str, path_col: str):
    """First existing video path in the CSV — the int8 activation-
    calibration sample (gated_int8_params)."""
    import os

    import pandas as pd

    try:
        df = pd.read_csv(csv_path)
    except OSError:
        return None
    for p in df.get(path_col, []):
        if isinstance(p, str) and os.path.exists(p):
            return p
    return None


def main(argv=None):
    from islx.isl.extract import ExtractConfig, extract_dataset

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("csv")
    p.add_argument("out_dir")
    p.add_argument("--shard-index", type=int, default=None,
                   help="default: jax.process_index() under multihost JAX")
    p.add_argument("--num-shards", type=int, default=None,
                   help="default: jax.process_count()")
    p.add_argument("--body-weights", default=None)
    p.add_argument("--hand-weights", default=None)
    p.add_argument("--path-col", default="Filepath")
    p.add_argument("--sticks", action="store_true",
                   help="also write stick-figure JPGs per frame")
    p.add_argument("--exact", action="store_true",
                   help="reference-parity per-frame path (compiles per "
                        "image/crop size; the default production path runs "
                        "one fused batched device program)")
    p.add_argument("--batch", type=int, default=16,
                   help="frames per fused device step (production path)")
    p.add_argument("--mesh-data", type=int, default=0, metavar="N",
                   help="shard each device batch over N devices (jax data-"
                        "parallel mesh; needs --batch divisible by N; 0 = "
                        "single device). Device-level DP — composes with "
                        "--shard-index/--num-shards process sharding, the "
                        "TPU-native replacement for the reference's "
                        "mp.Process DP (extract_features_mp.py:198-221).")
    args = p.parse_args(argv)

    if args.mesh_data and args.exact:
        p.error("--mesh-data requires the batched production path "
                "(drop --exact)")
    if args.mesh_data and args.batch % args.mesh_data:
        p.error(f"--batch {args.batch} not divisible by "
                f"--mesh-data {args.mesh_data}")

    batch = None
    if args.exact:
        from islx.isl.translator import ISLSignPos
        from islx.pose.body import Body
        from islx.pose.hand import Hand

        pose = ISLSignPos(Body(args.body_weights, "body25"),
                          Hand(args.hand_weights))
    else:
        from islx.core import weights as W
        from islx.models import cpm
        from islx.pipeline.batch_pose import FusedPosePipeline

        mesh = None
        if args.mesh_data:
            from islx.parallel.mesh import make_mesh

            mesh = make_mesh(n_data=args.mesh_data)
        from islx.cli import gated_hand_cfg, gated_int8_params

        bp = (W.load(args.body_weights, "body25")
              if args.body_weights else cpm.init_params("body25"))
        hp = (W.load(args.hand_weights, "hand")
              if args.hand_weights else cpm.init_params("hand"))
        hand_cfg = gated_hand_cfg(args.hand_weights, log=print)
        if args.body_weights and args.hand_weights:
            # recorded int8 GO (gates.json next to the checkpoint) -> W8A8
            # trunks, calibrated on the dataset's first readable video
            bp, hp, _ = gated_int8_params(
                bp, hp, hand_weights=args.hand_weights, hand_cfg=hand_cfg,
                calib_clip=_first_video(args.csv, args.path_col),
                log=print)
        pose = FusedPosePipeline(
            bp, hp,
            hand_cfg=hand_cfg,
            mesh=mesh)
        batch = args.batch
    if args.shard_index is None or args.num_shards is None:
        import jax

        shard_index = (args.shard_index if args.shard_index is not None
                       else jax.process_index())
        num_shards = (args.num_shards if args.num_shards is not None
                      else jax.process_count())
    else:
        shard_index, num_shards = args.shard_index, args.num_shards

    cfg = ExtractConfig(out_root=args.out_dir, write_sticks=args.sticks)
    out = extract_dataset(cfg, pose, args.csv, shard_index, num_shards,
                          args.path_col, batch=batch)
    print(f"shard {shard_index}/{num_shards} -> {out}")


if __name__ == "__main__":
    main()
