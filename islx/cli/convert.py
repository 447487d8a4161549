"""Weight conversion CLI (reference caffemodel2pytorch + model_converter.py).

    python -m islx.cli.convert SRC DST --model-type body25|coco|hand

SRC: .caffemodel (parsed natively, no protoc — islx.core.caffe_reader),
     .pt/.pth (reference converter output or torch state_dict), or .npz.
DST: .npz (islx native pytree dump).
"""
from __future__ import annotations

import argparse


def main(argv=None):
    from islx.core import weights as W
    from islx.models import cpm

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--model-type", required=True,
                   choices=["body25", "coco", "hand"])
    args = p.parse_args(argv)

    params = W.load(args.src, args.model_type)
    n = sum(int(v.size) for e in params.values() for v in e.values())
    expected = cpm.param_count(args.model_type)
    assert n == expected, f"param count {n} != expected {expected}"
    W.save_npz(args.dst, params)
    print(f"{args.src} -> {args.dst} ({n:,} params, verified)")


if __name__ == "__main__":
    main()
