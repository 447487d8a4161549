"""Summarize a jax.profiler TPU trace: device time by XLA op category.

Usage: python tools/trace_summary.py [/tmp/islx_trace] [--ops N]

Reads the .xplane.pb the profiler writes under
``<dir>/plugins/profile/<run>/``, finds the TPU device plane, and aggregates
"XLA Ops" line event durations by op-metadata name, grouped into the
categories used in docs/PERFORMANCE.md (conv fusions, quantize fusions,
copies/converts, while loops, other). The environment's
tensorboard-plugin-profile is ABI-incompatible with its tensorflow, so this
parses the xplane protobuf with the same wire-format reader approach as
islx/core/caffe_reader.py (schema: tsl/profiler/protobuf/xplane.proto).

Durations are picoseconds in the proto; reported in ms. Totals count
TPU-core planes only (no host plane), so this measures device busy time,
not wall clock.
"""
from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from islx.core.caffe_reader import _fields  # wire-format field iterator


def _msg(buf):
    return list(_fields(memoryview(bytes(buf))))


def _text(v) -> str:
    return bytes(v).decode("utf-8", "replace")


def parse_xspace(raw: bytes):
    """-> [(plane_name, {line_name: [(metadata_id, duration_ps)]},
            {metadata_id: op_name})]"""
    planes = []
    for f, _, v in _fields(memoryview(raw)):
        if f != 1:          # XSpace.planes
            continue
        name = ""
        lines = {}
        meta = {}
        for pf, _, pv in _msg(v):
            if pf == 2:     # XPlane.name
                name = _text(pv)
            elif pf == 3:   # XPlane.lines
                lname, events = "", []
                for lf, _, lv in _msg(pv):
                    if lf == 2:
                        lname = _text(lv)
                    elif lf == 11 and not lname:
                        lname = _text(lv)   # display_name fallback
                    elif lf == 4:           # XLine.events
                        mid = dur = 0
                        for ef, _, ev in _msg(lv):
                            if ef == 1:
                                mid = ev
                            elif ef == 3:
                                dur = ev
                        events.append((mid, dur))
                lines.setdefault(lname, []).extend(events)
            elif pf == 4:   # XPlane.event_metadata map<int64, XEventMetadata>
                mid, mname = 0, ""
                for mf, _, mv in _msg(pv):
                    if mf == 1:     # map key
                        mid = mv
                    elif mf == 2:   # map value = XEventMetadata
                        for ef, _, ev in _msg(mv):
                            if ef == 2:
                                mname = _text(ev)
                meta[mid] = mname
        planes.append((name, lines, meta))
    return planes


_CATEGORIES = (
    ("conv fusions", re.compile(r"convolution|conv[0-9_]|%conv")),
    ("quantize fusions", re.compile(r"clamp|round|quant")),
    ("copies/converts/format", re.compile(r"copy|convert|transpose|bitcast|reshape")),
    ("while loops", re.compile(r"while")),
    ("dynamic-update/scan", re.compile(r"dynamic-update|dynamic_update|scan")),
    ("reduce/select", re.compile(r"reduce|select|sort|iota|cumsum|compare")),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in _CATEGORIES:
        if pat.search(low):
            return cat
    return "other"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    root = args[0] if args else "/tmp/islx_trace"
    top_n = 25
    for a in sys.argv[1:]:
        if a.startswith("--ops"):
            top_n = int(a.split("=", 1)[1]) if "=" in a else 40
    pbs = []
    for dirpath, _, files in os.walk(root):
        pbs += [os.path.join(dirpath, f) for f in files
                if f.endswith(".xplane.pb")]
    if not pbs:
        sys.exit(f"no .xplane.pb under {root}")
    pb = max(pbs, key=os.path.getmtime)
    print(f"trace: {pb} ({os.path.getsize(pb)/1e6:.1f} MB)")
    planes = parse_xspace(open(pb, "rb").read())

    for pname, lines, meta in planes:
        if "TPU" not in pname.upper() or "#Chip" in pname:
            continue
        # module-level spans = per-step wall time on the core
        for mid, dur in sorted(lines.get("XLA Modules", []),
                               key=lambda e: -e[1])[:6]:
            name = meta.get(mid, f"id{mid}")
            print(f"  module span {dur/1e9:>8.2f} ms  {name[:70]}")
        for lname in ("XLA Ops", "Async XLA Ops"):
            if lname not in lines or not lines[lname]:
                continue
            by_op = defaultdict(lambda: [0, 0])   # name -> [ps, count]
            for mid, dur in lines[lname]:
                name = meta.get(mid, f"id{mid}")
                by_op[name][0] += dur
                by_op[name][1] += 1
            total_ps = sum(ps for ps, _ in by_op.values())
            by_cat = defaultdict(float)
            for name, (ps, _) in by_op.items():
                by_cat[categorize(name)] += ps
            overlap = (" (async: overlaps sync ops — not additive)"
                       if "Async" in lname else "")
            print(f"\n== {pname} / {lname}: {total_ps/1e9:.1f} ms "
                  f"across {len(by_op)} distinct ops{overlap} ==")
            for cat, ps in sorted(by_cat.items(), key=lambda kv: -kv[1]):
                print(f"  {cat:<28}{ps/1e9:>10.2f} ms  {100*ps/total_ps:5.1f}%")
            print(f"\n  top {top_n} ops:")
            for name, (ps, cnt) in sorted(by_op.items(),
                                          key=lambda kv: -kv[1][0])[:top_n]:
                print(f"    {ps/1e9:>9.2f} ms  x{cnt:<6} {name[:90]}")


if __name__ == "__main__":
    main()
