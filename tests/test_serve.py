"""Serving subsystem: micro-batcher semantics + HTTP endpoint end-to-end
(random weights, tiny frames; the check is batching behavior and the wire
contract, not pose quality)."""
import threading

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe():
    from islx.core.config import HandConfig, PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline

    return FusedPosePipeline(
        cpm.init_params("body25"), cpm.init_params("hand"),
        pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
        hand_cfg=HandConfig(scale_search=(0.25,)),   # 92px: CPU-cheap
        compute_dtype=jnp.float32)


def test_batcher_batches_concurrent_requests(pipe):
    from islx.serve import MicroBatcher

    b = MicroBatcher(pipe, max_batch=4, max_wait_ms=300.0, target_h=48)
    try:
        rng = np.random.RandomState(0)
        frames = [(rng.rand(96, 96, 3) * 255).astype(np.uint8)
                  for _ in range(4)]
        futs = [b.submit(f) for f in frames]     # before the worker wakes
        results = [f.result(timeout=300) for f in futs]
        for r in results:
            assert r.candidate.shape[1] == 4
            assert isinstance(r.hands, list)
        stats = b.stats()
        assert stats["requests"] == 4
        # all four arrived within one wait window -> shared device steps
        assert stats["batches"] <= 2
        # per-REQUEST latency percentiles (submit -> result; /healthz
        # surfaces these — VERDICT r4 #5)
        assert stats["latency_window_n"] == 4
        assert 0.0 < stats["latency_ms_p50_request"] <= \
            stats["latency_ms_p99_request"]
    finally:
        b.close()


def test_batcher_mixed_resolutions(pipe):
    from islx.serve import MicroBatcher

    b = MicroBatcher(pipe, max_batch=2, max_wait_ms=50.0, target_h=48)
    try:
        rng = np.random.RandomState(1)
        f1 = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        f2 = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        r1 = b.submit(f1)
        r2 = b.submit(f2)
        assert r1.result(timeout=300).subset is not None
        assert r2.result(timeout=300).subset is not None
        assert b.stats()["batches"] >= 2      # different programs
    finally:
        b.close()


def test_http_pose_endpoint(pipe):
    import json
    import urllib.request

    import cv2

    from islx.serve import PoseServer

    server = PoseServer(pipe, port=0, max_batch=2, max_wait_ms=20.0)
    server.batcher.target_h = 48
    server.start()
    try:
        rng = np.random.RandomState(2)
        img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        url = f"http://127.0.0.1:{server.port}"

        results = {}

        def post(name):
            req = urllib.request.Request(f"{url}/pose", data=buf.tobytes(),
                                         method="POST")
            with urllib.request.urlopen(req, timeout=300) as resp:
                results[name] = json.loads(resp.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for r in results.values():
            assert set(r) == {"candidate", "subset", "hands"}

        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["ok"] and health["requests"] >= 2

        # undecodable body -> 400, server keeps serving
        req = urllib.request.Request(f"{url}/pose", data=b"not an image",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server.close()


def test_live_traffic_int8_calibration(pipe):
    """quantize_after: the batcher calibrates on served frames, compiles the
    int8 pipeline in the BACKGROUND (the float pipeline keeps serving), and
    flips between batches; requests resolve throughout."""
    import time

    from islx.serve import MicroBatcher

    b = MicroBatcher(pipe, max_batch=2, max_wait_ms=50.0, target_h=48,
                     quantize_after=2)
    try:
        rng = np.random.RandomState(3)
        frames = [(rng.rand(96, 96, 3) * 255).astype(np.uint8)
                  for _ in range(4)]
        first = [b.submit(f) for f in frames[:2]]
        for f in first:
            assert f.result(timeout=600).candidate.shape[1] == 4
        # the swap is async: keep serving until the worker flips to the
        # background-compiled pipeline (no request ever paid its compile).
        # Generous deadline: the eager int8 calibration + compile is minutes
        # of CPU work and this suite may share the host with other jobs
        deadline = time.time() + 1200
        while not b.stats()["quantized"]:
            assert time.time() < deadline, "quantized swap never landed"
            fut = b.submit(frames[2])
            assert fut.result(timeout=600).candidate.shape[1] == 4
            time.sleep(0.2)
        fut = b.submit(frames[3])     # served by the int8 pipeline
        assert fut.result(timeout=600).candidate.shape[1] == 4
        assert any("w_q" in e for e in b.pipe.body.params.values())
    finally:
        b.close()


def test_program_cache_eviction(pipe):
    """max_resolutions bounds the per-resolution compiled-program caches
    under mixed traffic; evicted resolutions still serve (recompile)."""
    from islx.serve import MicroBatcher

    b = MicroBatcher(pipe, max_batch=2, max_wait_ms=10.0, target_h=48,
                     max_resolutions=2)
    try:
        rng = np.random.RandomState(5)
        shapes = [(96, 96), (64, 96), (80, 96), (96, 96)]
        for h, w in shapes:
            f = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            assert b.submit(f).result(timeout=600).subset is not None
        assert len(b._res_lru) <= 2
        assert b.stats().get("programs_evicted", 0) >= 1
        # fused program cache matches the LRU bound
        assert len(b.pipe._programs) <= 2
    finally:
        b.close()


def test_int8_calibration_survives_mixed_resolutions(pipe):
    """Mixed-resolution traffic must not crash the quantization swap (the
    calibration set keeps one shape; serving continues either way)."""
    from islx.serve import MicroBatcher

    b = MicroBatcher(pipe, max_batch=2, max_wait_ms=50.0, target_h=48,
                     quantize_after=3)
    try:
        rng = np.random.RandomState(4)
        futs = [b.submit((rng.rand(96, 96, 3) * 255).astype(np.uint8)),
                b.submit((rng.rand(64, 96, 3) * 255).astype(np.uint8)),
                b.submit((rng.rand(96, 96, 3) * 255).astype(np.uint8)),
                b.submit((rng.rand(96, 96, 3) * 255).astype(np.uint8))]
        for f in futs:
            assert f.result(timeout=600).candidate.shape[1] == 4
    finally:
        b.close()


def test_submit_after_close_fails_fast(pipe):
    """A submit racing (or following) close() must resolve immediately with
    an error — the worker is gone and nothing would ever serve it."""
    from islx.serve import MicroBatcher

    b = MicroBatcher(pipe, max_batch=2, max_wait_ms=10.0, target_h=48)
    b.close()
    fut = b.submit(np.zeros((96, 96, 3), np.uint8))
    assert fut.done()
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=0)


def test_cancelled_future_does_not_poison_batch(pipe):
    """A client cancelling its future mid-flight must not break the other
    requests in the same device batch (set_result on a cancelled future
    raises; the worker must skip done futures)."""
    from islx.serve import MicroBatcher

    # max_batch=3 with only 2 submits: the worker sits in the batching
    # window (3s) until dispatch, so cancel() lands before resolution and
    # the worker's skip-done path is actually exercised
    b = MicroBatcher(pipe, max_batch=3, max_wait_ms=3000.0, target_h=48)
    try:
        rng = np.random.RandomState(6)
        f1 = b.submit((rng.rand(96, 96, 3) * 255).astype(np.uint8))
        f2 = b.submit((rng.rand(96, 96, 3) * 255).astype(np.uint8))
        # futures are never marked running, so cancel() wins unless the
        # worker already resolved it — both orders must be safe
        won = f1.cancel()
        assert f2.result(timeout=600).candidate.shape[1] == 4
        if won:
            assert f1.cancelled()  # the worker must not have set_result
        else:
            assert f1.done()
    finally:
        b.close()


def test_batching_window_ends_on_full_batch(pipe):
    """A burst filling max_batch must dispatch immediately instead of
    sleeping out the (here: 15s) batching window."""
    import time

    from islx.serve import MicroBatcher

    b = MicroBatcher(pipe, max_batch=2, max_wait_ms=30000.0, target_h=48)
    try:
        rng = np.random.RandomState(7)
        frames = [(rng.rand(96, 96, 3) * 255).astype(np.uint8)
                  for _ in range(4)]
        # round 1 pays the program compile; round 2 times the window logic.
        # Bound = half the 30s window: generous slack for contended hosts
        # while still distinguishing immediate dispatch from a slept window.
        for f in [b.submit(x) for x in frames[:2]]:
            assert f.result(timeout=600).candidate.shape[1] == 4
        t0 = time.monotonic()
        for f in [b.submit(x) for x in frames[2:]]:
            assert f.result(timeout=600).candidate.shape[1] == 4
        assert time.monotonic() - t0 < 15.0  # << the 30s window
    finally:
        b.close()


def test_http_body_size_cap(pipe):
    import urllib.error
    import urllib.request

    from islx.serve import PoseServer

    server = PoseServer(pipe, port=0, max_batch=2, max_wait_ms=10.0)
    server.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/pose",
            data=b"\0" * (33 * 1024 * 1024), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 413
    finally:
        server.close()
