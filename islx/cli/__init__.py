"""CLI entry points.

Importing this package turns on JAX's persistent compilation cache (same
location bench.py and tests/conftest.py use): every CLI is a fresh process,
and on TPU an uncached fused-program compile costs 20-40s per run —
cross-process caching makes the second invocation of any surface start in
seconds. ``JAX_COMPILATION_CACHE_DIR`` (jax's own env knob) overrides the
location; ``ISLX_NO_JAX_CACHE=1`` disables the setup entirely.
"""
import os

if (not os.environ.get("ISLX_NO_JAX_CACHE")
        and not os.environ.get("JAX_COMPILATION_CACHE_DIR")):
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:   # cache is an optimization, never a requirement
        pass


def gated_hand_cfg(hand_weights: str | None = None, log=None):
    """Production hand config resolved through the per-checkpoint accuracy
    gate (islx.core.config.HandConfig.gated): gates.json written by
    tools/validate_checkpoints.py next to the weights decides the scale/
    stage flips; env (ISLX_HAND_SCALE/ISLX_HAND_STAGES) always wins. CLIs
    pass the --hand-weights path so the verdict travels with the checkpoint.

    When NO weights path is given the pipeline runs random init params, so
    no recorded verdict applies to them — the helper stays at the ungated
    production default instead of borrowing a GO/NO-GO recorded for some
    other checkpoint (ADVICE r4: the synthetic bundle's verdict must not
    flip serving of weights that were never evaluated)."""
    from islx.core.config import HandConfig

    if hand_weights is None:
        cfg = HandConfig.production()
        note = ("production default (no --hand-weights: gate verdicts "
                "travel with checkpoints)")
    else:
        import os

        cfg, note = HandConfig.gated(
            os.path.dirname(os.path.abspath(hand_weights)))
    if log is not None:
        log(f"hand config: {note}")
    return cfg
