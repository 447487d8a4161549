"""AOT program artifacts (islx.core.aot): serialized compiled executables
round-trip to disk, install into a fresh pipeline's program cache, and
produce bit-identical packed results — the serving warm-start path
(`islx.cli.export_programs` + `serve --aot-dir`).

The reference has no ahead-of-time/deployment surface at all (demos build
models synchronously per process, /root/reference/demo_video.py:48-49).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import *  # noqa: F401,F403


@pytest.fixture()
def tiny_pipes(monkeypatch):
    """Two independently-constructed tiny fused pipelines (same config)."""
    from islx.core.config import HandConfig, PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline

    monkeypatch.setenv("ISLX_PACK_MODE", "bits")
    bp, hp = cpm.init_params("body25"), cpm.init_params("hand")

    def mk():
        return FusedPosePipeline(
            bp, hp, pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
            hand_cfg=HandConfig(scale_search=(0.25,)),
            compute_dtype=jnp.float32)

    return mk


def test_aot_round_trip_bit_exact(tiny_pipes, tmp_path, rng):
    from islx.core import aot

    frames = (rng.rand(2, 48, 48, 3) * 255).astype(np.uint8)
    src = tiny_pipes()
    path = str(tmp_path / "prog.islxprog")
    meta = aot.save_fused(src, path, 2, 48, 48)
    assert meta["pack_mode"] == "bits"
    want = np.asarray(src.device_step(frames, thre1=0.02))

    dst = tiny_pipes()
    key = aot.load_fused(dst, path)
    assert key in dst._programs
    # the loaded executable answers without tracing a new program
    got = np.asarray(dst.device_step(frames, thre1=0.02))
    np.testing.assert_array_equal(want, got)
    assert len(dst._programs) == 1     # no second program compiled


def test_aot_mismatch_refused(tiny_pipes, tmp_path, monkeypatch):
    from islx.core import aot
    from islx.core.config import HandConfig, PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline

    src = tiny_pipes()
    path = str(tmp_path / "prog.islxprog")
    aot.save_fused(src, path, 2, 48, 48)

    # a pipeline with a different result packing must refuse the artifact
    monkeypatch.setenv("ISLX_PACK_MODE", "nook")
    other = FusedPosePipeline(
        cpm.init_params("body25"), cpm.init_params("hand"),
        pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
        hand_cfg=HandConfig(scale_search=(0.25,)),
        compute_dtype=jnp.float32)
    with pytest.raises(aot.AotMismatch, match="pack_mode"):
        aot.load_fused(other, path)
    # preload_dir skips foreign artifacts instead of failing
    assert aot.preload_dir(other, str(tmp_path)) == []

    # a pipeline whose param avals differ (bf16-cast leaves here; int8
    # scale leaves in production) must also refuse — the program's input
    # signature baked the original tree
    monkeypatch.setenv("ISLX_PACK_MODE", "bits")
    bf16 = FusedPosePipeline(
        cpm.init_params("body25"), cpm.init_params("hand"),
        pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
        hand_cfg=HandConfig(scale_search=(0.25,)),
        compute_dtype=jnp.bfloat16)
    with pytest.raises(aot.AotMismatch, match="params_sig"):
        aot.load_fused(bf16, path)


def test_aot_preload_dir_and_key_naming(tiny_pipes, tmp_path):
    from islx.core import aot

    src = tiny_pipes()
    key = src.program_key(2, 48, 48, (48, 48), "bgr")
    path = str(tmp_path / aot.artifact_name(key))
    aot.save_fused(src, path, 2, 48, 48)
    (tmp_path / "garbage.islxprog").write_bytes(b"not a pickle")

    dst = tiny_pipes()
    keys = aot.preload_dir(dst, str(tmp_path))
    assert keys == [key]


def test_export_programs_cli(tmp_path, monkeypatch):
    """islx.cli.export_programs writes a loadable artifact for each --orig
    (tiny shapes; hlo kind on CPU)."""
    from islx.cli import export_programs

    monkeypatch.setenv("ISLX_PACK_MODE", "bits")
    out = str(tmp_path / "aot")
    export_programs.main(["--out", out, "--batch", "1",
                          "--orig", "48x48", "--target-h", "48"])
    files = [f for f in os.listdir(out) if f.endswith(".islxprog")]
    assert len(files) == 1
    from islx.core import aot

    meta = aot.read_meta(os.path.join(out, files[0]))
    assert meta["kind"] == "hlo" and meta["key"][0] == 1


def test_microbatcher_aot_warm_start(tiny_pipes, tmp_path, rng):
    from islx.core import aot
    from islx.serve.batcher import MicroBatcher

    # export for the batcher's dispatch shape: b=max_batch, orig == bucket
    src = tiny_pipes()
    key = src.program_key(2, 48, 48, (48, 48), "bgr")
    aot.save_fused(src, str(tmp_path / aot.artifact_name(key)),
                   2, 48, 48)

    pipe = tiny_pipes()
    batcher = MicroBatcher(pipe, max_batch=2, max_wait_ms=1.0,
                           target_h=48, aot_dir=str(tmp_path))
    try:
        assert batcher.aot_loaded == [key]
        assert key in pipe._programs          # installed before any traffic
        frame = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        res = batcher.pose(frame, timeout=180.0)
        assert res.candidate.ndim == 2
        assert len(pipe._programs) == 1       # served BY the loaded program
    finally:
        batcher.close()
