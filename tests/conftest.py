"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; everything else is indifferent. Must run before
JAX initializes its backends, hence env vars set at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when the env points at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment may pre-register a TPU platform via sitecustomize before this
# conftest runs; the config update wins as long as no backend has been created yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the fast suite is dominated by CPU XLA compiles of
# the trainer/e2e programs (measured ~70% of wall time); warm-cache runs finish in
# a fraction of the cold time. The cache is repo-local and gitignored.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"
