"""Test env setup: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md section 4 item 4). Must run before the
first ``import jax`` anywhere in the test process."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic tests: no persistent XLA compile cache. (Also: serializing some
# CPU executables for the disk cache segfaulted in a long full-suite
# process — jax compilation_cache.put_executable_and_time.)
os.environ["MELLOW_TPU_COMPILE_CACHE"] = "off"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin at interpreter start and
# overrides env-level platform selection — force CPU via config so tests run
# on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
