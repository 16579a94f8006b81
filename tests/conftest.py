"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

NOTES on this environment:
  * jax is pre-imported and a TPU backend registered at interpreter startup
    (sitecustomize); env vars alone do not switch platform — a runtime config
    update is required (backends init lazily).
  * the persistent compile cache MUST be keyed by CPU microarchitecture:
    containers migrate across heterogeneous hosts, and a cached XLA:CPU AOT
    executable built for another host's CPU features kills the process with
    SIGILL when run here.
"""

import hashlib
import os


def _cpu_cache_dir() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.md5(line.encode()).hexdigest()[:10]
                    return f"/tmp/jax_cache_cpu_{tag}"
    except OSError:
        pass
    return "/tmp/jax_cache_cpu_generic"


os.environ["VOX_SERVE_PLATFORM"] = "cpu"  # picked up by server subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cpu_cache_dir()
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
