"""Benchmark: body25 + hand end-to-end frames/sec on one chip.

Workload (production config, BASELINE.md configs 1-4 family): every frame
runs the FUSED pose program (islx.pipeline.batch_pose.FusedPosePipeline) —
BODY_25 CPM on the bucketed scale-0.5 input, device NMS + PAF scoring +
device-sorted connection compaction, ON-DEVICE hand-box placement from the
PAF tables (islx.ops.hand_boxes), two hand crops per frame cut on device and
run through the hand CPM at the 368px single-scale production pyramid with
coarse-to-fine peak refinement — ONE u8 upload and ONE packed f32 fetch per
batch; host greedy grouping consumes the same fetch. Weights are random (the
reference ships none) — FLOPs and memory traffic are identical to converted
checkpoints.

The loop is double-buffered: batch i+1's device program is dispatched before
batch i's results are fetched, so device compute, host grouping and the
(tunnel-limited) transfers overlap.

Prints one JSON line: frames/sec/chip vs the 2000 fps north star
(BASELINE.json)."""
import json
import os
import time

import numpy as np

import jax

# persistent XLA compile cache: repeated bench runs skip the multi-minute
# program compiles entirely
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def _tpu_probe_once(probe_timeout_s: float) -> bool:
    """Probe the TPU in a SUBPROCESS (so a wedged relay can't hang us and we
    haven't initialized the axon backend in-process yet)."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8,8))*2).sum()))"],
            timeout=probe_timeout_s, capture_output=True)
        return out.returncode == 0 and b"128.0" in out.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def _tpu_alive() -> bool:
    """Probe, then if wedged: one long SILENCE window + one patient probe.

    Relay cold start is 30-120s, so a single short probe false-negatives on
    a healthy relay (round-1 bench fell back to CPU exactly this way). But
    REPEATED timed-out probes are worse: each killed probe process refreshes
    the relay's stale claim and keeps it wedged (measured: 6 short probes
    over 20 min all failed; 40 min of silence then one patient probe
    connected in ~80s — CLAUDE.md). So: one honest probe, one recovery
    cycle, done."""
    if _tpu_probe_once(150):
        return True
    time.sleep(300)                 # silence: let the stale claim expire
    return _tpu_probe_once(480)


def main():
    import cv2

    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    note = None
    if os.environ.get("ISLX_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
        note = "CPU forced via ISLX_BENCH_CPU (functional check)"
    elif not _tpu_alive():
        # stale relay claims can wedge the TPU for hours (see BENCH_NOTES.md);
        # a labeled CPU measurement beats recording nothing
        jax.config.update("jax_platforms", "cpu")
        note = "TPU runtime unreachable; CPU fallback measurement"

    # 64 frames/step: the ~100ms fixed fetch RPC and ~70ms upload amortize
    # over twice the device work vs B=32 (measured +20% fps; fetching every
    # other step instead measured SLOWER — the fetch already overlaps)
    degraded = note is not None        # CPU fallback / functional check
    B = 64 if not degraded else 4      # frames per device step

    img = cv2.imread("/root/reference/images/demo.jpg")
    if img is None:
        img = (np.random.RandomState(0).rand(512, 384, 3) * 255).astype(np.uint8)
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()

    body_params = cpm.init_params("body25")
    hand_params = cpm.init_params("hand")
    if os.environ.get("ISLX_BENCH_INT8"):
        # W8A8 int8 trunk (islx.models.quant): ~2x MXU peak on v5e. Not the
        # headline config until accuracy is validated on real checkpoints
        # (tools/hand_scale_eval.py pattern) — this measures the speedup.
        from islx.models import quant

        xcal = frames[:2].astype(np.float32) / 256.0 - 0.5
        body_params = quant.quantize_model(body_params, "body25", [xcal])
        crop = cv2.resize(frame[:hb, :hb], (368, 368),
                          interpolation=cv2.INTER_CUBIC)
        hcal = crop[None].astype(np.float32) / 256.0 - 0.5
        hand_params = quant.quantize_model(hand_params, "hand", [hcal])
        int8_label = "int8 (W8A8) trunks; accuracy unvalidated (no checkpoints)"
        note = f"{note}; {int8_label}" if note else int8_label

    pipe = FusedPosePipeline(body_params, hand_params,
                             compute_dtype=jnp.bfloat16)

    # Random weights produce noise heatmaps that saturate the peak tables and
    # make the (tiny, input-dependent) host grouping step look like the whole
    # workload. Calibrate thre1 so the peak density matches real scenes
    # (a few peaks/joint); device-side work is threshold-independent — hand
    # crops run for both per-frame slots whether or not an arm was chained.
    thre1 = 0.1
    for _ in range(24):
        packed = pipe.device_step(frames, (h0, w0), thre1)
        body_view, _, _ = pipe.unpack(packed, B)
        _, _, count, _, _, _ = pipe.body.unpack(body_view, B)
        if float(count.mean()) <= 4.0:
            break
        thre1 *= 2.0

    # unique frame bytes per iteration: the relay memoizes executions on
    # identical input buffers (CLAUDE.md), which would let repeated dispatch
    # of one buffer skip device compute entirely. One in-place byte flip per
    # dispatch (~zero host cost) makes every upload distinct.
    counter = [0]

    def dispatch():
        i = counter[0]
        counter[0] += 1
        frames[i % B, (i * 7) % hb, (i * 13) % wb, 0] ^= 1
        flat = pipe.upload_frames(frames)   # the ONLY upload per step
        return pipe.device_step_flat(flat, B, hb, wb, (h0, w0), thre1)

    def consume(p):
        # native C++ grouping when available; one packed fetch per step
        return pipe.assemble(p, B)

    consume(dispatch())  # compile + warm

    def timed_run(n_iters: int) -> float:
        # keep TWO batches in flight: upload(i+2) and fetch(i) both overlap
        # compute(i+1) (interleaved A/B measured depth 2 > depth 1)
        from collections import deque

        q = deque()
        t0 = time.perf_counter()
        for _ in range(n_iters):
            q.append(dispatch())
            if len(q) > 2:
                consume(q.popleft())
        while q:
            consume(q.popleft())
        return B * n_iters / (time.perf_counter() - t0)

    # median of 3 runs in one process: relay transfer jitter is +-30%
    # run-to-run, so a single window is a noisy record
    n_iters = 10 if not degraded else 2
    reps = 3 if not degraded else 1
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        # BENCH_PROFILE=dir captures a jax.profiler device trace of one
        # measurement window (TensorBoard-compatible) — the conv-utilization
        # workflow of TODO.md
        from islx.utils.profiling import trace

        with trace(profile_dir):
            timed_run(n_iters)
    fps = float(np.median([timed_run(n_iters) for _ in range(reps)]))
    record = {
        "metric": "body25_hand_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2000.0, 4),
    }
    if note:
        record["note"] = note
    print(json.dumps(record))


def _watchdog(timeout_s: float = None):
    """The tunneled TPU runtime can hang indefinitely (stale relay claims).
    Emit a zero-value record instead of silence if the bench stalls.
    Budget covers cold start (up to ~2 min) + uncached compiles (~6 min)."""
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_WATCHDOG_S", "1500"))
    import threading

    done = threading.Event()

    def run():
        try:
            main()
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if not done.is_set():
        print(json.dumps({
            "metric": "body25_hand_fps_per_chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "note": f"TPU runtime unresponsive for {timeout_s:.0f}s",
        }), flush=True)
        os._exit(1)


if __name__ == "__main__":
    _watchdog()
