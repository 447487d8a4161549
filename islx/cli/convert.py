"""Weight conversion CLI (reference caffemodel2pytorch + model_converter.py).

    python -m islx.cli.convert SRC DST --model-type body25|coco|hand

SRC: .caffemodel (parsed natively, no protoc — islx.core.caffe_reader),
     .pt/.pth (reference converter output or torch state_dict), or .npz.
DST: .npz (islx native pytree dump), or with --to-keras a .keras/.h5 Keras
     model (reference model_converter.py:11-43 equivalent, built from the
     same spec tables as the JAX forward — islx.models.keras_export).
"""
from __future__ import annotations

import argparse


def main(argv=None):
    # Conversion is a host-side tool: never initialize an accelerator backend
    # (the experimental axon TPU plugin can hang for minutes on init).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from islx.core import weights as W
    from islx.models import cpm

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--model-type", required=True,
                   choices=["body25", "coco", "hand"])
    p.add_argument("--to-keras", action="store_true",
                   help="export a runnable Keras model instead of .npz")
    args = p.parse_args(argv)

    params = W.load(args.src, args.model_type)
    n = sum(int(v.size) for e in params.values() for v in e.values())
    expected = cpm.param_count(args.model_type)
    assert n == expected, f"param count {n} != expected {expected}"
    if args.to_keras:
        from islx.models.keras_export import export_keras

        export_keras(params, args.model_type, args.dst)
    else:
        W.save_npz(args.dst, params)
    print(f"{args.src} -> {args.dst} ({n:,} params, verified)")


if __name__ == "__main__":
    main()
