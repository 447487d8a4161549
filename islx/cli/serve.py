"""Pose serving daemon: HTTP endpoint over the fused device program.

    python -m islx.cli.serve [--host 127.0.0.1] [--port 8008]
           [--body-weights W] [--hand-weights W] [--model-type body25|coco]
           [--max-batch 8] [--max-wait-ms 15]

    curl -s -X POST --data-binary @image.jpg localhost:8008/pose | jq .
    curl -s localhost:8008/healthz

Concurrent requests micro-batch into shared fused device steps (one upload
+ one fetch per batch; islx/serve/). The reference has no serving surface —
its closest analogue is the synchronous webcam loop (demo_camera.py:1-49).
"""
from __future__ import annotations

import argparse


def main(argv=None):
    from islx.core import weights as W
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline
    from islx.serve import PoseServer

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--body-weights", default=None)
    p.add_argument("--hand-weights", default=None)
    p.add_argument("--model-type", default="body25",
                   choices=["body25", "coco"])
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=15.0)
    p.add_argument("--int8-after", type=int, default=None, metavar="N",
                   help="after N served frames, calibrate on the live "
                        "traffic and swap in int8 (W8A8) trunks "
                        "(~1.8x MXU; validate accuracy for your workload)")
    p.add_argument("--aot-dir", default=None, metavar="DIR",
                   help="warm-start from AOT program artifacts exported by "
                        "`python -m islx.cli.export_programs` (matching "
                        "platform/batch/resolution artifacts skip the "
                        "in-process compile entirely)")
    p.add_argument("--mesh-data", type=int, default=0, metavar="N",
                   help="shard each served micro-batch over N devices (jax "
                        "data-parallel mesh; needs --max-batch divisible by "
                        "N; 0 = single device)")
    args = p.parse_args(argv)

    if args.mesh_data and args.max_batch % args.mesh_data:
        p.error(f"--max-batch {args.max_batch} not divisible by "
                f"--mesh-data {args.mesh_data}")
    mesh = None
    if args.mesh_data:
        from islx.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.mesh_data)
    from islx.cli import gated_hand_cfg

    # recorded int8 GO (gates.json next to the checkpoint) -> default to
    # live-traffic int8 calibration (the serving-native quantization route:
    # calibrate on the first N served frames, background-swap W8A8 trunks).
    # An explicit --int8-after always wins; ISLX_INT8=0 forces bf16.
    if args.int8_after is None and args.hand_weights:
        import os

        from islx.core.config import int8_gated

        go, note = int8_gated(
            os.path.dirname(os.path.abspath(args.hand_weights)))
        if go:
            args.int8_after = 256
            print(f"int8: {note} -> --int8-after 256 (live-traffic "
                  "calibration + warm swap)")
        else:
            print(f"int8: {note}")

    pipe = FusedPosePipeline(
        W.load(args.body_weights, args.model_type)
        if args.body_weights else cpm.init_params(args.model_type),
        W.load(args.hand_weights, "hand")
        if args.hand_weights else cpm.init_params("hand"),
        args.model_type,
        hand_cfg=gated_hand_cfg(args.hand_weights, log=print),
        mesh=mesh)
    server = PoseServer(pipe, args.host, args.port,
                        max_batch=args.max_batch,
                        max_wait_ms=args.max_wait_ms,
                        quantize_after=args.int8_after,
                        aot_dir=args.aot_dir)
    print(f"serving on http://{args.host}:{server.port}  "
          f"(POST /pose, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
