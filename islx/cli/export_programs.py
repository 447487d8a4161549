"""Export AOT-compiled fused pose programs for serving warm starts.

    python -m islx.cli.export_programs --out aot/ --batch 8 \
        --orig 480x640 --orig 720x1280 [--format bgr] [--target-h 184] \
        [--model-type body25] [--int8]

Each --orig HxW produces one artifact: the fused body+hand program compiled
for (batch, bucket_for(H,W), H/W scale factors) on THIS host's backend,
serialized executable included (islx.core.aot). A serving host started with
``python -m islx.cli.serve --aot-dir aot/ --max-batch 8`` loads matching
artifacts and answers its first request at those resolutions without paying
the 20-40s in-process compile.

Program bytes depend only on shapes + pipeline config — never on weight
values — so artifacts built here (random init) serve real checkpoints.
The reference has no ahead-of-time story (its demos rebuild models per
process at import: /root/reference/demo_video.py:48-49).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--batch", type=int, default=8,
                   help="frames per device step (= serve --max-batch)")
    p.add_argument("--orig", action="append", required=True, metavar="HxW",
                   help="original frame resolution(s) to export, repeatable")
    p.add_argument("--format", default="bgr", choices=["bgr", "yuv420"])
    p.add_argument("--target-h", type=int, default=184)
    p.add_argument("--model-type", default="body25",
                   choices=["body25", "coco"])
    p.add_argument("--int8", action="store_true",
                   help="export the int8 (W8A8) program (random-init "
                        "calibration; swap real scales at load via "
                        "quantized checkpoints — program bytes are "
                        "scale-value independent)")
    p.add_argument("--hand-weights", default=None, metavar="W",
                   help="the checkpoint serving will run: its gates.json "
                        "verdict decides the exported hand resolution "
                        "(program bytes stay weight-independent; without "
                        "this the ungated production default is exported)")
    args = p.parse_args(argv)

    from islx.cli import gated_hand_cfg
    from islx.core import aot
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    # exported programs must match what serving will run: the same
    # gate-resolved hand config (gates.json next to the serving checkpoint,
    # or env) feeds both
    hcfg = gated_hand_cfg(args.hand_weights, log=print)
    bp, hp = cpm.init_params(args.model_type), cpm.init_params("hand")
    if args.int8:
        import numpy as np

        from islx.models import quant

        hsize = int(np.rint(hcfg.scale_search[0] * hcfg.boxsize))
        cal = [np.zeros((1, args.target_h, args.target_h, 3), np.float32)]
        bp = quant.quantize_model(bp, args.model_type, cal)
        hp = quant.quantize_model(
            hp, "hand", [np.zeros((1, hsize, hsize, 3), np.float32)])
    pipe = FusedPosePipeline(bp, hp, args.model_type, hand_cfg=hcfg)

    os.makedirs(args.out, exist_ok=True)
    for spec in args.orig:
        h0, w0 = (int(v) for v in spec.lower().split("x"))
        hb, wb = bucket_for(h0, w0, target_h=args.target_h)
        key = pipe.program_key(args.batch, hb, wb, (h0, w0), args.format)
        path = os.path.join(args.out, aot.artifact_name(key))
        meta = aot.save_fused(pipe, path, args.batch, hb, wb, (h0, w0),
                              args.format)
        print(f"exported {path}  key={key}  platform={meta['platform']}")


if __name__ == "__main__":
    main()
