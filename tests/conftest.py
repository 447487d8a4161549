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
