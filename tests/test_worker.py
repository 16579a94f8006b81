import numpy as np
import pytest

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.sampling import SamplingConfig
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


@pytest.fixture(scope="module")
def worker():
    model = DummyLM(max_tokens=48)
    cfg = WorkerConfig(max_batch_size=4, num_pages=64, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=4,
                       warmup=False)
    return ModelWorker(model, cfg)


def _mkreq(rid, prompt="hello world"):
    return Request(request_id=rid, prompt=prompt,
                   # max_tokens is an ABSOLUTE position budget (prompt+generated),
                   # matching the reference's next_position_id semantics
                   sampling_config=SamplingConfig(max_tokens=48))


def test_prefill_then_decode(worker):
    req = _mkreq("r1")
    worker.run_lm_prefill([req])
    assert req.done_lm_prefill
    assert req.num_generated == 1
    assert req.kv_pages and req.kv_token_len == req.input_length

    for _ in range(8):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    assert req.num_generated >= 2
    for tok in req.lm_output_tokens:
        assert 0 <= int(tok[0]) < 64
    worker.free_kv_cache(req)
    assert req.slot is None and not req.kv_pages


def test_batched_decode_two_requests(worker):
    r1, r2 = _mkreq("r2", "aaaa"), _mkreq("r3", "bbbbbbbb")
    worker.run_lm_prefill([r1, r2])
    assert r1.num_generated == r2.num_generated == 1
    for _ in range(4):
        live = [r for r in (r1, r2) if not r.done_lm_generation]
        if not live:
            break
        worker.run_lm_decode(live)
    assert r1.num_generated >= 2 and r2.num_generated >= 2
    worker.free_kv_cache(r1)
    worker.free_kv_cache(r2)


def test_detokenize_produces_pcm(worker):
    req = _mkreq("r4", "xyzw")
    worker.run_lm_prefill([req])
    while len(req.lm_output_audio_tokens) < 8 and not req.done_lm_generation:
        worker.run_lm_decode([req])
    n_chunks_avail = len(req.lm_output_audio_tokens) // 4
    assert n_chunks_avail >= 1
    req.next_audio_decode_idx = [0]
    worker.run_detokenize([req])
    pcm = req.output_audio.get_nowait()
    # 4 tokens * 80 samples * int16
    assert len(pcm) == 4 * 80 * 2
    x = np.frombuffer(pcm, np.int16)
    assert np.abs(x).max() > 1000  # actual signal, not silence
    worker.free_kv_cache(req)


def test_final_partial_chunk_trim_rule(worker):
    """Reference rule: pad final chunk to interval, then trim audio to
    (len - 0.5) / interval (worker/base.py:662-669)."""
    req = _mkreq("r5", "qq")
    worker.run_lm_prefill([req])
    while len(req.lm_output_audio_tokens) < 6 and not req.done_lm_generation:
        worker.run_lm_decode([req])
    req.done_lm_generation = True
    # first full chunk
    req.next_audio_decode_idx = [0]
    worker.run_detokenize([req])
    req.output_audio.get_nowait()
    # partial final chunk of 2 tokens (indices 4,5)
    req.lm_output_audio_tokens = req.lm_output_audio_tokens[:6]
    req.audio_decode_idx = [0]
    req.next_audio_decode_idx = [4]
    worker.run_detokenize([req])
    pcm = req.output_audio.get_nowait()
    expected = int(4 * 80 * (2 - 0.5) / 4) * 2
    assert len(pcm) == expected
    assert req.done_all
    worker.free_kv_cache(req)


def test_kv_pages_grow_across_page_boundary(worker):
    req = _mkreq("r6", "a" * 8)  # exactly one page (page_size=8)
    worker.run_lm_prefill([req])
    assert len(req.kv_pages) == 1
    worker.run_lm_decode([req])  # token 9 -> new page
    assert len(req.kv_pages) == 2
    worker.free_kv_cache(req)


def test_slot_reuse_and_allocator_balance(worker):
    free_before = worker.allocator.num_free
    slots_before = len(worker._free_slots)
    reqs = [_mkreq(f"r7{i}", "hi") for i in range(3)]
    worker.run_lm_prefill(reqs)
    for r in reqs:
        worker.run_lm_decode([r])
        worker.free_kv_cache(r)
    assert worker.allocator.num_free == free_before
    assert len(worker._free_slots) == slots_before


@pytest.mark.parametrize("page_size", [64, 128])
def test_large_page_sizes(page_size):
    """Token generation is page-size invariant (the kernel DMA-efficiency
    tuning runs with page 64/128; the reference CLI default is 128)."""
    def run(ps):
        model = DummyLM(max_tokens=40)
        cfg = WorkerConfig(max_batch_size=2, num_pages=16, page_size=ps,
                           prefill_token_buckets=(256,),
                           max_prefill_requests=2, warmup=False)
        w = ModelWorker(model, cfg)
        req = Request(request_id=f"p{ps}", prompt="page size check",
                      sampling_config=SamplingConfig(max_tokens=40,
                                                     greedy=True))
        w.run_lm_prefill([req])
        for _ in range(12):
            if req.done_lm_generation:
                break
            w.run_lm_decode([req])
        w.sync()
        return [int(t[0]) for t in req.lm_output_tokens]

    assert run(page_size) == run(8)


def test_detok_bucket_ceiling_splits_batches():
    """A detok lattice whose largest bucket is below max_batch_size splits
    wide detokenize batches into ceiling-sized chunks (codec HBM cap)."""
    model = DummyLM(max_tokens=40)
    cfg = WorkerConfig(max_batch_size=4, num_pages=64, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=4,
                       warmup=False, detok_buckets_override=(2,))
    w = ModelWorker(model, cfg)
    reqs = []
    for i in range(4):
        r = Request(request_id=f"dc{i}", prompt="x" * 4,
                    sampling_config=SamplingConfig(max_tokens=40))
        w.run_lm_prefill([r])
        iv = model.detokenize_interval
        r.lm_output_audio_tokens = [np.full((model.n_codebooks,), 3, np.int32)
                                    for _ in range(iv)]
        r.next_audio_decode_idx = [0]
        reqs.append(r)
    w.run_detokenize(reqs)
    w.flush_detokenize()
    w.sync()
    got = [not r.output_audio.empty() for r in reqs]
    assert all(got), got


def test_codec_dtype_bf16():
    """codec_dtype=bfloat16 casts codec params + slot caches and still
    produces finite PCM (reference serves decoders at the model dtype)."""
    import jax.numpy as jnp

    model = DummyLM(max_tokens=40)
    cfg = WorkerConfig(max_batch_size=2, num_pages=32, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=2,
                       warmup=False, codec_dtype="bfloat16")
    w = ModelWorker(model, cfg)
    leaves = [a for a in __import__("jax").tree.leaves(model.codec_params)
              if hasattr(a, "dtype")]
    assert all(a.dtype != jnp.float32 for a in leaves)
    req = Request(request_id="bf16", prompt="hello",
                  sampling_config=SamplingConfig(max_tokens=40))
    w.run_lm_prefill([req])
    iv = model.detokenize_interval
    while len(req.lm_output_audio_tokens) < iv and not req.done_lm_generation:
        w.run_lm_decode([req])
    w.sync()
    req.next_audio_decode_idx = [0]
    w.run_detokenize([req])
    w.flush_detokenize()
    w.sync()
    assert not req.output_audio.empty()


def test_combined_kv_worker_matches_legacy():
    """head_dim=128 models use the combined token-major KV pool; end to end
    the worker must produce the same greedy tokens as the legacy pair layout
    (VOX_KV_COMBINED=0)."""
    import os

    def run(disable_combined):
        if disable_combined:
            os.environ["VOX_KV_COMBINED"] = "0"
        else:
            os.environ.pop("VOX_KV_COMBINED", None)
        try:
            model = DummyLM(max_tokens=40, head_dim=128)
            cfg = WorkerConfig(max_batch_size=2, num_pages=32, page_size=8,
                               prefill_token_buckets=(64,),
                               max_prefill_requests=2, warmup=False)
            w = ModelWorker(model, cfg)
            assert w.kv_config.combined is (not disable_combined)
            reqs = [Request(request_id=f"c{i}", prompt=p,
                            sampling_config=SamplingConfig(
                                max_tokens=40, top_k=1, temperature=1.0))
                    for i, p in enumerate(["hello world", "zz"])]
            w.run_lm_prefill(reqs)
            for _ in range(10):
                live = [r for r in reqs if not r.done_lm_generation]
                if not live:
                    break
                w.run_lm_decode(live)
            w.sync()
            return [[int(t[0]) for t in r.lm_output_tokens] for r in reqs]
        finally:
            os.environ.pop("VOX_KV_COMBINED", None)

    toks_combined = run(False)
    toks_legacy = run(True)
    assert all(len(t) > 3 for t in toks_combined)
    assert toks_combined == toks_legacy
