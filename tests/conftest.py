"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

NOTE: this environment pre-imports jax and registers a TPU backend via
sitecustomize with JAX_PLATFORMS=axon, so env vars alone do not switch the
platform — a runtime config update is required (backends init lazily).
"""

import os

os.environ["VOX_SERVE_PLATFORM"] = "cpu"  # picked up by server subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache makes repeated test runs much faster
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
