"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh, the analogue of
the reference's per-ISA TEST_REQUIRES gates (test strategy: SURVEY.md section 4).
Set QNNPACK_TPU_TEST_PLATFORM=tpu to run the suite on real hardware instead.

NOTE: this environment force-registers the `axon` TPU backend from
sitecustomize and exports JAX_PLATFORMS=axon, so the env var must be
overridden at the jax.config level, not via os.environ.
"""

import os

_PLATFORM = os.environ.get("QNNPACK_TPU_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
