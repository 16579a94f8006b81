"""Warmup compiles every bucket and leaves serving state intact."""

import numpy as np

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


def test_warmup_then_serve():
    model = DummyLM(max_tokens=12)
    cfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=8,
                       prefill_token_buckets=(32,), max_prefill_requests=2,
                       warmup=True)
    worker = ModelWorker(model, cfg)
    # every bucket pre-compiled
    assert ("prefill", (32, 2)) in worker._lm_fns
    # one bucket-independent decode wrapper serves all buckets (jit
    # retraces per input shape internally)
    assert ("decode", ()) in worker._lm_fns
    assert 1 in worker._detok_fns and 2 in worker._detok_fns
    # allocator untouched by warmup
    assert worker.allocator.num_free == 63
    assert len(worker._free_slots) == 2
    # serving still works after warmup
    req = Request(request_id="w", prompt="hello")
    worker.run_lm_prefill([req])
    assert req.done_lm_prefill
    worker.run_lm_decode([req])
    assert req.num_generated >= 2
    worker.free_kv_cache(req)


def test_persistent_state_committed():
    """Every persistent device buffer must be COMMITTED to a device at
    construction: jit keys executables on sharding commitment, and a
    buffer that flips uncommitted->committed mid-serving (e.g. via the
    detokenizer's device_put token upload) recompiles the whole step —
    a measured 36 s TTFA outlier on TPU (artifacts/bench_progression_r3.md).
    """
    import jax

    model = DummyLM(max_tokens=12)
    worker = ModelWorker(model, WorkerConfig(
        max_batch_size=2, num_pages=64, page_size=8,
        prefill_token_buckets=(32,), max_prefill_requests=2, warmup=False))
    uncommitted = []

    def check(name, tree):
        jax.tree.map(
            lambda a: uncommitted.append(name)
            if isinstance(a, jax.Array) and not a.committed else None, tree)

    check("params", worker.model.params)
    check("k_pages", worker.k_pages)
    check("v_pages", worker.v_pages)
    check("feedback", worker.feedback)
    check("last_tokens", worker.last_tokens)
    check("base_key", worker._base_key)
    check("codec_params", worker.model.codec_params)
    check("rep_cache", worker.rep_cache)
    check("codec_cache", worker.codec_cache)
    check("watermark_params", worker.watermark_params)
    assert not uncommitted, f"uncommitted persistent buffers: {uncommitted}"


def test_persistent_state_committed_tp():
    """Under tensor parallelism the LM-side buffers must be committed to the
    MESH device set (replicated), not lm_device alone — a single-device
    commitment makes jit reject the step with "incompatible devices"
    (ADVICE r3: the tp branch of _commit_persistent_state was untested)."""
    import jax
    import jax.numpy as jnp
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from vox_serve_tpu.models.backbone import BackboneConfig
    from vox_serve_tpu.models.glm_voice import GLMVoiceLM
    from tests.test_tensor_parallel import FLOW, HIFT

    model = GLMVoiceLM(
        dtype=jnp.float32, debug_flow=FLOW, debug_hift=HIFT,
        debug_backbone=BackboneConfig(
            vocab_size=168960, hidden_size=64, num_layers=2, num_heads=8,
            num_kv_heads=4, head_dim=16, intermediate_size=128,
            qkv_bias=True, rope_dim=8, dtype=jnp.float32))
    worker = ModelWorker(model, WorkerConfig(
        max_batch_size=2, num_pages=64, page_size=16,
        prefill_token_buckets=(64,), max_prefill_requests=2,
        warmup=False, tp_size=4))
    mesh_devices = set(worker.mesh.devices.flatten())

    problems = []

    def check(name, tree):
        def leaf(a):
            if not isinstance(a, jax.Array):
                return
            if not a.committed:
                problems.append(f"{name}: uncommitted")
            elif set(a.sharding.device_set) != mesh_devices:
                problems.append(
                    f"{name}: device set {a.sharding.device_set} != mesh")
        jax.tree.map(leaf, tree)

    # every LM-side buffer lives on the full mesh device set (params/KV
    # sharded, per-slot buffers replicated)
    check("params", worker.model.params)
    for name in ("k_pages", "v_pages", "feedback", "last_tokens",
                 "_base_key", "rep_cache"):
        check(name, getattr(worker, name))
    assert not problems, problems
