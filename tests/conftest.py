"""Test config: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 implication)."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS env; the config update works.
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-dominated otherwise
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"

# Synthetic trained checkpoint bundle (make synthetic-weights): when present
# and no real weights dir is configured, point the weights-gated golden tests
# at it so the parity / int8 / hand-scale gates execute instead of skipping.
_SYNTH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".synthetic_weights")
if not os.environ.get("ISLX_WEIGHTS_DIR") and os.path.exists(
        os.path.join(_SYNTH, "pose_iter_584000.caffemodel.pt")):
    os.environ["ISLX_WEIGHTS_DIR"] = _SYNTH


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "src"))


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()),
    reason="reference repo or torch unavailable",
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# Quick tier (`python -m pytest tests/ -m quick`, <5 min): one representative
# compile-light test per subsystem, so the full ~35-min suite is not the only
# signal. Kept as a single list here instead of decorators scattered over the
# files; parametrized variants of a listed test are all included.
# ---------------------------------------------------------------------------
QUICK_TESTS = {
    "test_ops.py::TestPeaks::test_matches_oracle",            # peak NMS op
    "test_ops.py::TestHandPeaks::test_two_blob_tiebreak",     # hand CC op
    "test_models.py::test_param_count",                       # net specs
    "test_pose_parity.py::test_hand_detect_parity",           # detector
    "test_grouping_edges.py::test_merge_two_disjoint_subsets",  # grouping
    "test_translator.py::test_featurizer_parity",             # 156-d features
    "test_translator.py::test_expressions_match_reference",   # vocab
    "test_caffe_net.py::TestNetForward::test_conv_matches_torch",  # shim
    "test_components.py::TestCaffeReader::test_roundtrip",    # wire parser
    "test_components.py::TestExtractDataset::test_shard_rows",  # sharding
    "test_video_io.py::test_flat_batches_padding",            # video IO
    "test_yuv.py::test_yuv420_to_bgr_matches_cv2",            # YUV ingest
    "test_quant.py::test_conv_q_matches_int_emulation",       # int8
    "test_checkpoint.py::test_pytree_roundtrip",              # checkpoint
    "test_native.py::test_empty",                             # C++ grouping
    "test_parallel.py::test_mesh_shapes",                     # mesh/sharding
    "test_draw_parity.py::test_draw_bodypose_pixel_exact",    # renderers
    "test_serve.py::test_submit_after_close_fails_fast",      # serving
    "test_hand_boxes.py::TestDeviceHandBoxes::test_short_arm_dropped",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("tests/")[-1].split("[")[0]
        if base in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)
