"""Fused multi-step decode (one dispatch for k steps) vs single-step parity.

The fused path scans k decode bodies inside one executable
(worker/base.py run_lm_decode_multi); with greedy sampling the token
sequence must be bit-identical to the single-step path, and the serving
behavior (chunks, completion, resource release) unchanged.
"""

import numpy as np
import pytest

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.sampling import SamplingConfig
from vox_serve_tpu.scheduler.base import Scheduler
from vox_serve_tpu.scheduler.online import OnlineScheduler
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


def _greedy_model(max_tokens=16):
    m = DummyLM(max_tokens=max_tokens)
    m.sampling_config = SamplingConfig(greedy=True, max_tokens=max_tokens)
    return m


def _drive(sched, reqs, max_steps=200):
    for r in reqs:
        sched.enqueue_request(r)
    for _ in range(max_steps):
        sched._step()
        if all(r.done_all for r in reqs):
            break
    return sched._inproc_results


def test_fused_decode_matches_single_step_tokens():
    base_cfg = dict(max_batch_size=4, num_pages=64, page_size=8,
                    prefill_token_buckets=(64,), max_prefill_requests=4,
                    warmup=False)
    tokens = {}
    for fused in (0, 4):
        w = ModelWorker(_greedy_model(), WorkerConfig(
            **base_cfg, fused_decode_steps=fused,
            fused_decode_buckets=(2,)))
        s = Scheduler(model_worker=w, max_batch_size=4, connect=False)
        req = Request(request_id="f1", prompt="hello fused world")
        _drive(s, [req])
        assert req.done_all
        tokens[fused] = [int(t[0]) for t in req.lm_output_tokens]
        assert req.slot is None and not req.kv_pages
    assert tokens[0] == tokens[4], (tokens[0], tokens[4])


def test_fused_decode_two_streams_same_audio_bytes():
    cfgs = {}
    for fused in (0, 3):
        w = ModelWorker(_greedy_model(), WorkerConfig(
            max_batch_size=4, num_pages=64, page_size=8,
            prefill_token_buckets=(64,), max_prefill_requests=4,
            warmup=False, fused_decode_steps=fused,
            fused_decode_buckets=(2,)))
        s = OnlineScheduler(model_worker=w, max_batch_size=4, connect=False)
        reqs = [Request(request_id=f"s{i}", prompt=f"stream number {i}",
                        is_streaming=True, is_pressing=True)
                for i in range(2)]
        msgs = _drive(s, reqs)
        audio = {}
        for i in range(2):
            rid = f"s{i}".encode()
            audio[i] = b"".join(
                m.split(b"|", 2)[2] for m in msgs
                if m.startswith(rid) and m.split(b"|")[1] == b"AUDIO")
            assert len(audio[i]) > 0
        cfgs[fused] = audio
    assert cfgs[0] == cfgs[3]


def test_fused_decode_respects_block_table_limit():
    # a request that cannot take k tokens falls back to single-step
    w = ModelWorker(_greedy_model(max_tokens=16), WorkerConfig(
        max_batch_size=2, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=2,
        warmup=False, fused_decode_steps=4, fused_decode_buckets=(2,)))
    req = Request(request_id="lim", prompt="x")
    w.run_lm_prefill([req])
    w.sync()
    # artificially push the request to the edge of its block table
    limit = w.max_pages_per_seq * w.config.page_size
    req.kv_token_len = limit - 2
    assert not w.can_decode_multi([req], 4)
    req.kv_token_len = limit - 8
    assert w.can_decode_multi([req], 4)


def test_fused_decode_input_streaming_caps_k():
    sched_cfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=8,
                             prefill_token_buckets=(64,),
                             max_prefill_requests=2, warmup=False,
                             fused_decode_steps=4, fused_decode_buckets=(2,))
    w = ModelWorker(_greedy_model(), sched_cfg)
    s = Scheduler(model_worker=w, max_batch_size=2, connect=False)
    req = Request(request_id="st", prompt="x", is_input_streaming=True)
    req.pending_text_tokens.put(5)
    req.pending_text_tokens.put(6)
    # fewer buffered tokens than k: fall back to single-step — warmup only
    # compiles (bucket, k), so any other fused k would compile mid-serving
    assert s._fused_decode_steps([req]) == 1
    req.pending_text_tokens.put(7)
    req.pending_text_tokens.put(8)
    assert s._fused_decode_steps([req]) == 4
    while not req.pending_text_tokens.empty():
        req.pending_text_tokens.get()
    req.text_complete = True
    assert s._fused_decode_steps([req]) == 4


def test_cold_start_chained_first_chunk_matches_host_path():
    """run_cold_start (prefill + fused decode + chained detok, zero
    intermediate readbacks) must produce byte-identical audio to the
    host-side mini-ramp path under greedy sampling."""
    from vox_serve_tpu.scheduler.online import OnlineScheduler

    audio_by_mode = {}
    for fused in (0, 2):
        w = ModelWorker(_greedy_model(max_tokens=24), WorkerConfig(
            max_batch_size=4, num_pages=64, page_size=8,
            prefill_token_buckets=(64,), max_prefill_requests=4,
            warmup=False, first_chunk_frames=2,
            fused_decode_steps=fused, fused_decode_buckets=(2,)))
        s = OnlineScheduler(model_worker=w, max_batch_size=4, connect=False)
        req = Request(request_id="cs", prompt="chained cold start",
                      is_streaming=True, is_pressing=True)
        msgs = _drive(s, [req])
        assert req.done_all
        audio = b"".join(m.split(b"|", 2)[2] for m in msgs
                         if m.startswith(b"cs") and m.split(b"|")[1] == b"AUDIO")
        assert len(audio) > 0
        audio_by_mode[fused] = audio
        if fused:
            assert w.can_cold_start(req) or req.is_input_streaming is False
            # the single-dispatch chain executable must actually be used
            assert any(k[0] == "cold_chain" for k in w._lm_fns), \
                "cold start silently fell back off the single-dispatch path"
    assert audio_by_mode[0] == audio_by_mode[2], (
        len(audio_by_mode[0]), len(audio_by_mode[2]))


def test_cold_start_early_stop_trims_chunk():
    """A stream that stops inside its first chunk window emits trimmed audio
    and completes."""
    from vox_serve_tpu.scheduler.online import OnlineScheduler

    w = ModelWorker(_greedy_model(max_tokens=24), WorkerConfig(
        max_batch_size=2, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=2,
        warmup=False, first_chunk_frames=2,
        fused_decode_steps=2, fused_decode_buckets=(2,)))
    s = OnlineScheduler(model_worker=w, max_batch_size=2, connect=False)
    # max_tokens barely above the prompt so the length cap hits immediately
    req = Request(request_id="es", prompt="stop early now",
                  is_streaming=True, is_pressing=True,
                  sampling_config=SamplingConfig(greedy=True, max_tokens=1))
    # absolute-position cap: prompt len already exceeds it -> stops at once
    _drive(s, [req])
    assert req.done_all


def test_cold_start_long_prompt_falls_back_to_two_dispatch():
    """Prompts landing in a non-smallest prefill bucket must not lazily
    compile a cold_chain executable (mid-serving XLA stall); they take the
    2-dispatch path (prefill, then the warmed fused decode+detok chain) and
    still stream audio."""
    w = ModelWorker(_greedy_model(max_tokens=24), WorkerConfig(
        max_batch_size=4, num_pages=128, page_size=8,
        prefill_token_buckets=(16, 128), max_prefill_requests=4,
        warmup=False, first_chunk_frames=2,
        fused_decode_steps=2, fused_decode_buckets=(2,)))
    s = OnlineScheduler(model_worker=w, max_batch_size=4, connect=False)
    req = Request(request_id="lp",
                  prompt="a deliberately long prompt " * 4,
                  is_streaming=True, is_pressing=True)
    msgs = _drive(s, [req])
    assert req.done_all
    assert req.input_length > 16, "prompt must exceed the smallest bucket"
    audio = b"".join(m.split(b"|", 2)[2] for m in msgs
                     if m.startswith(b"lp") and m.split(b"|")[1] == b"AUDIO")
    assert len(audio) > 0
    # no cold_chain compiled for the big bucket
    assert not any(k[0] == "cold_chain" and k[1][0] > 16
                   for k in w._lm_fns), "big-bucket chain must not compile"


def test_cold_start_sampled_tokens_match_across_paths():
    """With STOCHASTIC sampling and a fixed worker seed, the unfused,
    fused-2-dispatch, and single-dispatch-chain cold paths must produce the
    SAME token sequence: all three advance the RNG fold counter identically
    (prefill c+1, then one fold per decode step). Catches counter
    misalignment the greedy equality test cannot see."""
    toks = {}
    for fused in (0, 2):
        m = DummyLM(max_tokens=20)
        m.sampling_config = SamplingConfig(temperature=0.9, top_k=8,
                                           max_tokens=20)
        w = ModelWorker(m, WorkerConfig(
            max_batch_size=4, num_pages=64, page_size=8,
            prefill_token_buckets=(64,), max_prefill_requests=4,
            warmup=False, first_chunk_frames=2 if fused else 0,
            fused_decode_steps=fused, fused_decode_buckets=(2,)))
        s = OnlineScheduler(model_worker=w, max_batch_size=4, connect=False)
        req = Request(request_id="rng", prompt="stochastic cold start",
                      is_streaming=True, is_pressing=True)
        _drive(s, [req])
        assert req.done_all
        toks[fused] = [int(t[0]) for t in req.lm_output_tokens]
        if fused:
            assert any(k[0] == "cold_chain" for k in w._lm_fns)
    assert toks[0] == toks[2], (toks[0], toks[2])


def test_fused_k_schedule_selects_per_bucket_k():
    """The granularity schedule (WorkerConfig.fused_k_schedule) maps a
    decode batch to its bucket's step count, and the scheduler dispatches
    that k (not the global fused_decode_steps)."""
    w = ModelWorker(_greedy_model(), WorkerConfig(
        max_batch_size=8, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4, warmup=False,
        fused_decode_steps=4, fused_decode_buckets=(1, 4, 8),
        fused_k_schedule=(4, 2, 4)))
    assert w.fused_k_for(1) == 4
    assert w.fused_k_for(2) == 2
    assert w.fused_k_for(4) == 2
    assert w.fused_k_for(5) == 4
    assert w.fused_k_for(9) == 1  # no covering bucket

    def reqs(n):
        out = []
        for i in range(n):
            r = Request(request_id=f"k{i}", done_lm_prefill=True)
            r.lm_output_tokens.append(np.array([1], np.int32))
            r.kv_token_len = 4
            r.kv_pages = [0]
            out.append(r)
        return out

    s = Scheduler(model_worker=w, max_batch_size=8, connect=False)
    assert s._fused_decode_steps(reqs(1)) == 4
    assert s._fused_decode_steps(reqs(3)) == 2
    # the bucket's scheduled k AND the full fused_decode_steps are both
    # warmed (latency-regime granularity + throughput-regime catch-up);
    # any other k would lazily compile mid-serving
    assert w.can_decode_multi(reqs(3), 2)
    assert w.can_decode_multi(reqs(3), 4)
    assert not w.can_decode_multi(reqs(3), 3)
    # first-chunk chains (bucket, first_chunk_frames) are warmed separately
    assert w.can_decode_multi(reqs(1)[:1], 3, first_chunk=True)

    # throughput regime (latched via load pressure): mid buckets run the
    # FULL k — post-wave catch-up must not crawl at granularity k
    w2 = ModelWorker(_greedy_model(), WorkerConfig(
        max_batch_size=8, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4, warmup=False,
        fused_decode_steps=4, fused_decode_buckets=(1, 4, 8),
        fused_k_schedule=(4, 2, 4), fused_min_batch=5))
    s2 = Scheduler(model_worker=w2, max_batch_size=8, connect=False)
    assert s2._fused_decode_steps(reqs(3)) == 2  # latency regime
    s2._load_pressure = 6  # backlog pushes past fmin -> latch up
    assert s2._fused_decode_steps(reqs(3)) == 4  # full k at the mid bucket


def test_fused_k_schedule_token_parity():
    """k=2-scheduled buckets produce the same greedy tokens as single-step
    and as the global-k path."""
    base_cfg = dict(max_batch_size=4, num_pages=64, page_size=8,
                    prefill_token_buckets=(64,), max_prefill_requests=4,
                    warmup=False)
    tokens = {}
    for name, extra in (
            ("single", dict(fused_decode_steps=0)),
            ("sched", dict(fused_decode_steps=4,
                           fused_decode_buckets=(1, 2),
                           fused_k_schedule=(4, 2)))):
        w = ModelWorker(_greedy_model(), WorkerConfig(**base_cfg, **extra))
        s = Scheduler(model_worker=w, max_batch_size=4, connect=False)
        a = Request(request_id="pa", prompt="hello schedule world")
        b = Request(request_id="pb", prompt="hello schedule world")
        _drive(s, [a, b])
        assert a.done_all and b.done_all
        tokens[name] = [int(t[0]) for t in a.lm_output_tokens]
    assert tokens["single"] == tokens["sched"]


def test_fused_k_schedule_validation():
    base = dict(max_batch_size=4, num_pages=64, page_size=8,
                prefill_token_buckets=(64,), max_prefill_requests=4,
                warmup=False, fused_decode_steps=3,
                fused_decode_buckets=(1, 4))
    with pytest.raises(ValueError, match="one .*k per fused bucket"):
        ModelWorker(_greedy_model(), WorkerConfig(
            **base, fused_k_schedule=(3,)))
    with pytest.raises(ValueError, match="fused_k_schedule entries"):
        ModelWorker(_greedy_model(), WorkerConfig(
            **base, fused_k_schedule=(3, 5)))
