"""Tracing / profiling / observability.

The reference's only instrumentation is wall-clock stamps embedded in output
filenames (extract_features_mp.py:142-144). Here:

* :class:`StageTimer` — named wall-clock spans with summary stats, the
  lightweight always-on layer.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace.
* :func:`log_compile_cache` — visibility into jit cache growth (shape-bucket
  pipelines should stabilize; growth means a bucketing leak).

NOTE on timing device code here: only fetch-inclusive spans are meaningful on
tunneled runtimes — see bench.py.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class StageTimer:
    """Accumulate named wall-clock spans: ``with timer("decode"): ...``."""

    def __init__(self):
        self._spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._spans[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._spans[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._spans.items():
            xs_sorted = sorted(xs)
            out[name] = {
                "count": len(xs),
                "total_s": sum(xs),
                "mean_ms": 1000 * sum(xs) / len(xs),
                "p50_ms": 1000 * xs_sorted[len(xs) // 2],
                "max_ms": 1000 * xs_sorted[-1],
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>8}{'mean ms':>10}{'p50 ms':>10}"
                 f"{'max ms':>10}{'total s':>10}"]
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{name:<24}{s['count']:>8}{s['mean_ms']:>10.2f}"
                         f"{s['p50_ms']:>10.2f}{s['max_ms']:>10.2f}"
                         f"{s['total_s']:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compile_cache() -> Dict[str, int]:
    """Count live jitted executables (bucketing-leak detector)."""
    import jax

    try:
        from jax._src import pjit as _pjit

        n = int(_pjit._cpp_pjit_cache_fun_only.currsize  # type: ignore
                if hasattr(_pjit, "_cpp_pjit_cache_fun_only") else -1)
    except Exception:
        n = -1
    return {"pjit_cache_entries": n,
            "live_arrays": len(jax.live_arrays())}
