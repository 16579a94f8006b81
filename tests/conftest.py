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


# ---------------------------------------------------------------------------
# fast/slow split: the full suite is compile-heavy (~25 min). The fast gate
# (`pytest -m "not slow" -q`, a few minutes) covers ops, scheduler policy,
# worker mechanics, and codec-layer math; `slow` marks model e2e,
# multi-process server, and golden-parity modules.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_backbone_loaders", "test_campplus_parity", "test_chatterbox_cond_parity", "test_backbone_vs_hf", "test_cosy_flow_parity",
    "test_cosyvoice2", "test_csm", "test_disaggregation", "test_dp",
    "test_e2e_inprocess", "test_ecapa_parity", "test_first_chunk",
    "test_glm_flow_parity", "test_hift_parity", "test_http_server",
    "test_mimi_parity", "test_multi_chunk_detok", "test_orpheus", "test_perth_parity",
    "test_qwen3_codec", "test_qwen3_codec_parity", "test_qwen3_tts",
    "test_remaining_models", "test_silentcipher_parity", "test_snac_parity",
    "test_step_dit_parity", "test_tensor_parallel", "test_voice_cloning",
    "test_warmup", "test_whisper_exact_parity", "test_zonos", "test_zonos_conditioning",
    "test_zonos_speaker_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
