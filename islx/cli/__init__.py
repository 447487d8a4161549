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


def _calib_frames(calib_clip=None, calib_image=None, n: int = 2):
    """-> up to ``n`` evenly spaced BGR u8 frames from the CLI's own input
    (the head of the clip, or the still image) — the activation-calibration
    sample for gated int8 quantization."""
    import numpy as np

    if calib_image is not None:
        return [np.asarray(calib_image)]
    if calib_clip is None:
        return []
    from islx.pipeline.video import FrameSource

    frames = []
    with FrameSource(calib_clip) as src:
        for i, f in enumerate(src):
            frames.append(f)
            if i + 1 >= 8 * n:
                break
    if not frames:
        return []
    step = max(len(frames) // n, 1)
    return frames[::step][:n]


def gated_int8_params(body_params, hand_params, *, model_type="body25",
                      hand_weights=None, hand_cfg=None,
                      calib_clip=None, calib_image=None, log=None):
    """Apply the recorded per-checkpoint int8 verdict to loaded float
    params: when gates.json next to the weights says ``int8_default: GO``
    (tools/validate_checkpoints.py), the trunks are quantized to W8A8
    (islx.models.quant, ~1.8x the bf16 conv rate on v5e) with activation
    scales calibrated on the CLI's OWN input, and the quantized pytrees are
    cached under ``<weights_dir>/.int8_cache`` so only the first run pays.
    ``ISLX_INT8`` env always wins (1 force on, 0 force off).

    -> (body_params, hand_params, applied: bool). Like gated_hand_cfg, no
    verdict is borrowed when no --hand-weights path was given (the verdict
    travels with the checkpoint it was evaluated on)."""
    from islx.core.config import HandConfig, int8_gated

    def _log(msg):
        if log is not None:
            log(msg)

    import os

    if hand_weights is None and os.environ.get("ISLX_INT8") != "1":
        _log("int8: bf16 (no --hand-weights: the int8 verdict travels "
             "with checkpoints)")
        return body_params, hand_params, False
    wdir = (os.path.dirname(os.path.abspath(hand_weights))
            if hand_weights is not None else None)
    go, note = int8_gated(wdir)
    _log(f"int8: {note}")
    if not go:
        return body_params, hand_params, False
    frames = _calib_frames(calib_clip, calib_image)
    if not frames:
        _log("int8: no calibration source available; staying bf16")
        return body_params, hand_params, False

    import cv2
    import numpy as np

    import jax

    from islx.core import checkpoint as ckpt
    from islx.models import quant
    from islx.pipeline.batch_pose import bucket_for

    hand_cfg = hand_cfg or HandConfig.production()
    h0, w0 = frames[0].shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    hsize = int(np.rint(hand_cfg.scale_search[0] * hand_cfg.boxsize))
    xcal = np.stack([cv2.resize(f, (wb, hb), interpolation=cv2.INTER_CUBIC)
                     for f in frames]).astype(np.float32) / 256.0 - 0.5
    s = min(h0, w0)
    hcal = np.stack([cv2.resize(
        f[(h0 - s) // 2:(h0 + s) // 2, (w0 - s) // 2:(w0 + s) // 2],
        (hsize, hsize), interpolation=cv2.INTER_CUBIC)
        for f in frames]).astype(np.float32) / 256.0 - 0.5

    # per-checkpoint disk cache: keyed by the weight files' identity and
    # the calibration shapes; a changed checkpoint recalibrates
    croot = os.path.join(wdir, ".int8_cache") if wdir else None
    fp = None
    if croot is not None:
        import json

        def _ident(p):
            try:
                st = os.stat(p)
                return [os.path.basename(p), st.st_size, int(st.st_mtime)]
            except OSError:
                return [os.path.basename(p) if p else None]

        fp = {"hand": _ident(hand_weights), "body_bucket": [hb, wb],
              "hsize": hsize, "model_type": model_type}
        meta_path = os.path.join(croot, "meta.json")
        try:
            with open(meta_path) as f:
                if json.load(f) == fp:
                    qb = ckpt.load_pytree(os.path.join(croot, "body"))
                    qh = ckpt.load_pytree(os.path.join(croot, "hand"))
                    _log("int8: quantized pytrees loaded from "
                         f"{croot}")
                    return qb, qh, True
        except Exception:
            pass

    # calibration forwards run EAGERLY (per-conv observers) — pin them to
    # the host CPU backend so each op is not a relay round trip (the
    # bench.py pattern)
    import contextlib

    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu0 = None
    ctx = (jax.default_device(cpu0) if cpu0 is not None
           else contextlib.nullcontext())
    _log("int8: calibrating activation scales on this input "
         "(one-time per checkpoint; cached)")
    with ctx:
        qb = quant.quantize_model(body_params, model_type, [xcal])
        qh = quant.quantize_model(hand_params, "hand", [hcal])
    qb = jax.tree.map(np.asarray, qb)
    qh = jax.tree.map(np.asarray, qh)
    if croot is not None:
        import json

        try:
            ckpt.save_pytree(os.path.join(croot, "body"), qb)
            ckpt.save_pytree(os.path.join(croot, "hand"), qh)
            with open(os.path.join(croot, "meta.json"), "w") as f:
                json.dump(fp, f)
        except OSError as e:
            _log(f"int8: cache write failed ({e}); continuing uncached")
    return qb, qh, True
