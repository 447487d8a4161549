"""Train the ISL translator head on extracted features.

The reference repo ships NO training code (its keras head came from an
external notebook; SURVEY.md §0) — this CLI closes the loop on the dataset
path its extraction pipelines produce:

    extract (islx.cli.extract) -> FEATURES_ROOT/<video_id>/<frame>.json
    train   (this CLI)         -> head .npz (+ optional full bundle)
    translate (islx.cli.translate --head/--bundle)

    python -m islx.cli.train FEATURES_ROOT --labels LABELS.csv --out HEAD.npz
           [--epochs 20] [--batch 32] [--lr 1e-3] [--checkpoint-dir DIR]
           [--bundle DIR --body-weights W --hand-weights W]
           [--mesh-data N --mesh-model M]

LABELS.csv: columns ``video_id,expression`` (expression = a name from
islx.isl.expressions, case-insensitive). Training is checkpointed per epoch
and resumes from --checkpoint-dir on restart.
"""
from __future__ import annotations

import argparse
import csv


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("features_root")
    p.add_argument("--labels", required=True,
                   help="CSV with video_id,expression columns")
    p.add_argument("--out", required=True, help="head checkpoint (.npz)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None,
                   help="per-epoch TrainState checkpoints (crash resume)")
    p.add_argument("--bundle", default=None,
                   help="also save a full translator bundle to this dir")
    p.add_argument("--keras-bundle", default=None,
                   help="also export a portable one-model .keras artifact "
                        "(islx.models.one_model)")
    p.add_argument("--body-weights", default=None)
    p.add_argument("--hand-weights", default=None)
    p.add_argument("--model-type", default="body25",
                   choices=["body25", "coco"])
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel mesh axis (0 = no mesh, single chip)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh axis for the head kernels")
    args = p.parse_args(argv)

    from islx.core.config import TranslatorConfig
    from islx.isl import dataset as D
    from islx.isl import train as TR
    from islx.models import translator as T

    labels = {}
    with open(args.labels) as f:
        for row in csv.DictReader(f):
            labels[row["video_id"]] = row["expression"]

    cfg = TranslatorConfig()
    x, y = D.build_windows(args.features_root, labels, cfg, args.model_type)
    if x.shape[0] == 0:
        raise SystemExit("no training windows — check features_root/labels")
    print(f"{x.shape[0]} windows of [{cfg.window_size},{cfg.feature_dim}] "
          f"over {len(set(y.tolist()))} classes")

    mesh = None
    if args.mesh_data:
        from islx.parallel import mesh as M

        mesh = M.make_mesh(n_data=args.mesh_data, n_model=args.mesh_model)
    params = TR.fit(x, y, epochs=args.epochs, batch_size=args.batch,
                    lr=args.lr, cfg=cfg, mesh=mesh, seed=args.seed,
                    checkpoint_dir=args.checkpoint_dir)
    T.save_npz(args.out, params)
    print(f"head -> {args.out}")

    if args.bundle or args.keras_bundle:
        from islx.core import weights as W
        from islx.models import cpm

        body = (W.load(args.body_weights, args.model_type)
                if args.body_weights else cpm.init_params(args.model_type))
        hand = (W.load(args.hand_weights, "hand") if args.hand_weights
                else cpm.init_params("hand"))
        if args.bundle:
            from islx.core import checkpoint as ckpt

            ckpt.save_bundle(args.bundle, body, hand, params,
                             args.model_type)
            print(f"bundle -> {args.bundle}")
        if args.keras_bundle:
            from islx.models import one_model

            one_model.export_one_model(body, hand, params,
                                       args.keras_bundle,
                                       model_type=args.model_type, cfg=cfg)
            print(f"keras one-model -> {args.keras_bundle}")


if __name__ == "__main__":
    main()
