"""Test configuration: run hermetically on CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual 8-device CPU mesh;
Pallas kernels run via the interpreter. Real-TPU checks live in
benchmarks/ and are run explicitly, not by the default suite.

The environment may pre-register a TPU PJRT plugin via sitecustomize
*before* any user code runs (pinning JAX_PLATFORMS at import), so an
env-var override here would be ignored. Instead we flip the platform
through jax.config after import — legal because no backend has been
initialized yet at conftest-load time. Set RUN_TESTS_ON_TPU=1 to run the
suite against the real chip instead.
"""

import os

# "0"/"false"/"" must mean OFF — presence-only parsing would send a user
# who exported RUN_TESTS_ON_TPU=0 to the real chip
_ON_TPU = os.environ.get("RUN_TESTS_ON_TPU", "").lower() not in (
    "", "0", "false", "no")

if not _ON_TPU:
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The suite's wall time is dominated by ~35 distinct XLA:CPU compiles;
    # a persistent compilation cache makes warm re-runs ~2-3x faster. The
    # cpu_aot_loader logs a benign per-load "machine feature" error about
    # the prefer-no-scatter/gather TUNING pseudo-features — suppress C++
    # log noise unless the caller asked for it. Opt out: JAX_TEST_NO_CACHE=1.
    if not os.environ.get("JAX_TEST_NO_CACHE"):
        os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if not os.environ.get("JAX_TEST_NO_CACHE"):
        _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if _ON_TPU:
    # Remote Mosaic/XLA compiles (20-120 s each) dominate on-chip suite
    # time; a persistent cache makes the periodic on-chip pass affordable.
    # Same JAX_TEST_NO_CACHE opt-out as the CPU branch.
    import jax

    if not os.environ.get("JAX_TEST_NO_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
