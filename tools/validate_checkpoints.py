"""One-command checkpoint activation: flip every weights-gated decision.

The reference ships no weights (model/ is download-only,
/root/reference/README.md:43-54), so two production defaults sit behind
accuracy gates that only real checkpoints can open (PARITY.md #7,
docs/PERFORMANCE.md "Headroom"):

  1. 184px hand crops (HandConfig.production, 4x fewer hand-CPM FLOPs)
  2. int8 (W8A8) trunks (~2x MXU on the dominant convs)

The moment checkpoints are downloaded, run:

    ISLX_WEIGHTS_DIR=/path/to/weights python tools/validate_checkpoints.py

and this tool runs, in one pass:

  * the golden parity suite (tests/test_golden_weights.py: islx vs the
    reference's own torch code on images/demo.jpg, <1px mean keypoint L2,
    plus the int8-vs-float golden),
  * the hand-pyramid scale evaluation (tools/hand_scale_eval.py),

then prints an explicit GO / NO-GO per gate:

  * GO for 184 crops  = single_184 mean L2 < 1px vs the 4-scale pyramid
    (otherwise export ISLX_HAND_SCALE=1.0 in production)
  * GO for int8       = the int8 golden test passed
    (then serve with --int8-after / quantize offline via islx.cli.quantize)

Exit code 0 = every gate evaluated (GO or NO-GO); 1 = weights missing or a
gate could not be evaluated.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# accuracy gates run on CPU: never collide with a TPU process on the
# one-process-at-a-time relay (the pytest subprocess's conftest does the
# same); ISLX_EVAL_TPU=1 opts into device execution
if not os.environ.get("ISLX_EVAL_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def run_golden_suite(selector: str) -> dict:
    """pytest a subset of tests/test_golden_weights.py.

    verdict: GO (ran and passed), NO-GO (a test failed), or UNEVALUATED
    (everything skipped — e.g. npz-only checkpoints can't feed the
    reference torch oracle, see test_golden_weights._torch_loadable)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_golden_weights.py",
         "-k", selector, "-q", "--tb=line"],
        cwd=REPO, capture_output=True, text=True)
    tail = (out.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    if " failed" in summary or out.returncode not in (0, 5):
        verdict = "NO-GO"
    elif " passed" in summary and out.returncode == 0:
        verdict = "GO"
    else:
        verdict = "UNEVALUATED"
    return {"returncode": out.returncode, "summary": summary,
            "verdict": verdict, "output": out.stdout}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", default="/root/reference/images")
    p.add_argument("--crops-per-image", type=int, default=8)
    p.add_argument("--hand-gate-px", type=float, default=1.0,
                   help="mean-L2 (or delta-vs-368, in GT mode) threshold "
                        "for the hand-crop GOs")
    p.add_argument("--signal-px", type=float, default=8.0,
                   help="PYRAMID-mode sanity bar: when the single_368 "
                        "baseline drifts past this vs the checkpoint's own "
                        "4-scale pyramid, the instrument has no signal and "
                        "hand verdicts are UNEVALUABLE instead of a "
                        "meaningless NO-GO (VERDICT r4 weak #1/#2)")
    p.add_argument("--gt-detector-px", type=float, default=24.0,
                   help="GT-mode detector bound: the baseline's MEDIAN GT "
                        "L2 must sit under this (3 net strides) for it to "
                        "count as a localizing detector. GT-mode gate "
                        "RESOLUTION is certified separately by the paired-"
                        "delta standard error (se < gate), which is what "
                        "bounds a 1px decision — absolute baseline bias is "
                        "paired out of the deltas.")
    p.add_argument("--json", action="store_true",
                   help="emit one machine-readable JSON line at the end")
    p.add_argument("--skip-ref-pyramid", action="store_true",
                   help="GT mode: skip the (expensive, verdict-irrelevant) "
                        "4-scale reference pyramid config")
    p.add_argument("--reuse-eval", metavar="GATES_JSON", default=None,
                   help="re-issue verdicts from the hand_scale_eval stats "
                        "recorded in an existing gates.json (e.g. after a "
                        "gate-rule change) instead of re-measuring")
    args = p.parse_args(argv)

    from tools.hand_scale_eval import (CONFIG_KEYS, evaluate, evaluate_gt,
                                       find_hand_gt, find_weights)

    wdir = os.environ.get("ISLX_WEIGHTS_DIR", "")
    body_w, hand_w = find_weights(wdir)
    if not (body_w and hand_w):
        print("NO-GO: set ISLX_WEIGHTS_DIR to a directory with downloaded "
              "reference checkpoints (body25 + hand). Links: "
              "/root/reference/README.md:43-54")
        return 1

    print(f"weights: body25={body_w} hand={hand_w}")
    verdict = {"weights_dir": wdir}

    # 1. golden parity suite — the reference-comparison goldens and the
    # int8-vs-float golden gate DIFFERENT decisions, so they are judged
    # independently (npz-only checkpoints skip the former, not the latter)
    print("\n[1/2] golden parity suite (tests/test_golden_weights.py)...")
    parity = run_golden_suite("demo_golden or full_demo or scene_golden")
    print("      ref parity: " + parity["summary"])
    if parity["verdict"] == "NO-GO":
        print(parity["output"])
    int8 = run_golden_suite("int8_quantized")
    print("      int8 golden: " + int8["summary"])
    if int8["verdict"] == "NO-GO":
        print(int8["output"])
    verdict["golden_parity"] = parity["verdict"]
    verdict["int8_default"] = int8["verdict"]

    # 2. hand scale evaluation. Two instruments:
    #
    #   GT mode (preferred; synthetic bundles ship scenes/hand_gt.json):
    #   every config scored against the generator's ground-truth joints —
    #   discriminative even on a scale-inconsistent checkpoint, because each
    #   config's accuracy is measured independently. GO = the fast config's
    #   mean-L2 DELTA vs the single_368 baseline stays under the gate and it
    #   finds nearly as many joints.
    #
    #   Pyramid mode (real checkpoints, no GT): each single-scale config vs
    #   the checkpoint's own 4-scale pyramid (the reference contract,
    #   src/hand.py:25-56), absolute mean L2 under the gate.
    #
    #   Either way, when the single_368 BASELINE itself fails the sanity bar
    #   the instrument has NO signal (round-4: baseline drifted 113.9px vs
    #   its own pyramid, so every config failed identically) and the
    #   verdicts are UNEVALUABLE — production then stays on the ungated
    #   default and says so, rather than recording a meaningless NO-GO.
    gt_path = find_hand_gt(wdir)
    res = None
    gate = args.hand_gate_px
    try:
        if args.reuse_eval:
            with open(args.reuse_eval) as f:
                prev = json.load(f)
            res = prev["hand_scale_eval"]
            verdict["hand_instrument"] = prev.get("hand_instrument",
                                                  "gt" if gt_path else
                                                  "pyramid")
            gt_path = gt_path if verdict["hand_instrument"] == "gt" else None
            print(f"\n[2/2] hand scale eval REUSED from {args.reuse_eval}")
        elif gt_path:
            print(f"\n[2/2] hand scale eval (GROUND-TRUTH instrument: "
                  f"{gt_path})...")
            res = evaluate_gt(hand_w, gt_path,
                              include_ref=not args.skip_ref_pyramid)
            verdict["hand_instrument"] = "gt"
        else:
            print("\n[2/2] hand scale eval (pyramid-consistency instrument"
                  " — no GT sidecar)...")
            res = evaluate(body_w, hand_w, args.images,
                           args.crops_per_image)
            verdict["hand_instrument"] = "pyramid"
    except RuntimeError as e:
        print(f"      could not evaluate: {e}")
        verdict["hand_184_default"] = "UNEVALUATED"
    if res is not None:
        base = res.get("single_368")
        paired = res.get("paired", {})
        for k in ("ref_4scale",) + CONFIG_KEYS if gt_path else CONFIG_KEYS:
            if k == "ref_4scale" and k not in res:
                continue
            s = res.get(k)
            line = ("NO matched keypoints (unusable)" if s is None else
                    f"mean L2 {s['mean']:.2f}px"
                    + (f"  median {s['median']:.2f}px" if "median" in s
                       else "")
                    + f"  p95 {s['p95']:.2f}px  max {s['max']:.2f}px  "
                    f"(n={s['n']}"
                    + (f", found {s['found']:.0%}" if s and "found" in s
                       else "") + ")")
            p = paired.get(k)
            if p:
                line += (f"  paired-delta {p['mean_delta']:+.2f}px "
                         f"(se {p['se']:.2f})")
            print(f"      {k}: {line}")
        # Signal bar. GT mode: the baseline must FIND joints and its
        # TYPICAL (median) L2 must sit under the bar — the gross-
        # misdetection tail on the hardest scenes appears in every config
        # on the SAME (scene, joint) pairs, so it cancels in the paired
        # deltas the GO rule uses and carries no crop-resolution
        # information; a baseline whose median drifts past the bar, or
        # that misses half the joints, is not a detector and the verdicts
        # are withheld. Pyramid mode keeps the mean (self-consistency of a
        # real checkpoint has no tail of this kind).
        base_stat = (base.get("median", base["mean"]) if gt_path
                     else base["mean"]) if base else float("inf")
        bar = args.gt_detector_px if gt_path else args.signal_px
        signal = (base is not None and base_stat < bar
                  and (base.get("found", 1.0) > 0.5))
        if not signal:
            why = ("baseline single_368 found nothing" if base is None else
                   f"baseline single_368 {'median' if gt_path else 'mean'} "
                   f"{base_stat:.1f}px > {bar:g}px "
                   + ("detector bound" if gt_path else "sanity bar"))
            print(f"      INSTRUMENT HAS NO SIGNAL: {why}")

        def config_go(key: str) -> str:
            if not signal:
                return "UNEVALUABLE"
            s = res.get(key)
            if s is None:
                return "NO-GO"
            if gt_path:
                # paired per-(scene,joint) delta vs the 368 baseline: GO
                # when the measured accuracy cost stays under the gate AND
                # the instrument can actually resolve the gate (se<gate)
                # AND joint coverage is comparable
                p = paired.get(key)
                if p is None:
                    return "NO-GO"
                if p["se"] > gate:
                    return "UNEVALUABLE"
                ok = (p["mean_delta"] < gate
                      and s["found"] >= base["found"] - 0.05)
            else:         # absolute drift vs the checkpoint's own pyramid
                ok = s["mean"] < gate
            return "GO" if ok else "NO-GO"

        verdict["hand_184_default"] = config_go("single_184")
        # 160px crops (scale 160/368): 2203 fps/chip on-device with all 6
        # stages (tools/tpu_validate.py trimspan) — gate like 184
        verdict["hand_160_default"] = config_go("single_160")
        # deepest stage trim that ALSO holds at 160px (s5@160 = 2308
        # fps/chip device span — BENCH_NOTES.md trimspan); gated on its own
        # measured drift, not inferred from the 184px trims
        verdict["hand_160_stages"] = (
            5 if (verdict["hand_160_default"] == "GO"
                  and config_go("s5_160") == "GO") else 6)
        # deepest CPM stage trim whose drift stays under the gate
        # (HandConfig.stages / ISLX_HAND_STAGES — cpm.hand_forward)
        trim = 6
        for k, n in (("s5_184", 5), ("s4_184", 4)):
            if config_go(k) == "GO":
                trim = n
            else:
                break
        verdict["hand_stages"] = trim
        verdict["hand_scale_eval"] = res

    print("\n==================== VERDICT ====================")
    print(f"golden parity (<1px vs reference torch): "
          f"{verdict['golden_parity']}"
          + ("   -> needs .pt/.pth checkpoints (npz is islx-only)"
             if verdict["golden_parity"] == "UNEVALUATED" else ""))
    g184 = verdict["hand_184_default"]
    print(f"184px hand crops as production default : {g184}"
          + ("" if g184 == "GO" else
             "   -> instrument had no signal; verdict withheld"
             if g184 == "UNEVALUABLE" else
             "   -> production falls back to 368 (HandConfig.gated)"))
    if "hand_160_default" in verdict:
        print(f"160px hand crops (2203 fps/chip span)  : "
              f"{verdict['hand_160_default']}"
              + ("   -> export ISLX_HAND_SCALE=0.4348"
                 if verdict["hand_160_default"] == "GO" else ""))
    if "hand_stages" in verdict:
        n = verdict["hand_stages"]
        print(f"hand CPM stage trim                    : "
              + (f"GO for {n} stages -> export ISLX_HAND_STAGES={n}"
                 if n < 6 else "NO-GO (keep 6 stages)"))
    print(f"int8 trunks as production default      : "
          f"{verdict['int8_default']}"
          + ("" if verdict["int8_default"] == "GO"
             else "   -> keep bf16 (drop --int8-after)"))
    if args.json:
        print(json.dumps(verdict, default=str))
    # persist the verdict next to the evaluated weights: production
    # consumers (bench.py flagship config, pipelines) read gates.json
    # instead of re-running the evaluation
    try:
        with open(os.path.join(wdir, "gates.json"), "w") as f:
            json.dump(verdict, f, default=str, indent=1)
        print(f"\nverdict written to {os.path.join(wdir, 'gates.json')}")
    except OSError as e:
        print(f"\ncould not write gates.json: {e}")
    gates = ("golden_parity", "hand_184_default", "int8_default")
    return 0 if all(verdict.get(g) in ("GO", "NO-GO") for g in gates) else 1


if __name__ == "__main__":
    raise SystemExit(main())
