"""Test config: force CPU with 8 virtual devices so sharding tests can run
without a TPU pod (SURVEY.md §4 implication; the driver's dryrun_multichip
uses the same mechanism)."""

import os

# The harness pre-sets JAX_PLATFORMS=axon (one real TPU chip via tunnel)
# and the axon plugin overrides the env var — only the jax config knob
# actually switches platforms. Unit tests want the 8-device virtual CPU
# mesh; FLEXAM_TEST_PLATFORM=axon opts back into the real chip.
_platform = os.environ.get("FLEXAM_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# This box has ONE cpu core; XLA compiles dominate test time. Cache them.
# FLEXAM_TEST_CACHE=0 opts out — REQUIRED for any pytest/jax process run
# concurrently with another: concurrent access to the persistent cache
# segfaults this toolchain inside the cache read (observed twice
# 2026-08-17, `compilation_cache.get_executable_and_time`).
if os.environ.get("FLEXAM_TEST_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("FLEXAM_TEST_CACHE_DIR") or
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

jax.config.update("jax_threefry_partitionable", True)
# This JAX build defaults to reduced matmul precision even on CPU; tests
# verify fp32 algorithms, so force full precision (prod TPU paths feed bf16
# inputs with fp32 accumulation and keep the fast default).
jax.config.update("jax_default_matmul_precision", "highest")
