"""Multi-chunk detokenize catch-up for stateful codecs (VERDICT weak #2).

A request with k ready windows decodes them as ONE (k-1)*step+interval
sequential window inside its slot, instead of one window per scheduler step.
"""

import numpy as np

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


def _worker(**kw):
    model = DummyLM(max_tokens=64)
    cfg = WorkerConfig(max_batch_size=4, num_pages=64, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=4,
                       warmup=False, **kw)
    return ModelWorker(model, cfg)


def _req_with_audio(worker, rid, n_tokens):
    req = Request(request_id=rid)
    worker.admit(req)
    rng = np.random.default_rng(7)
    req.lm_output_audio_tokens = [
        rng.integers(0, 60, size=(1,)).astype(np.int32)
        for _ in range(n_tokens)]
    return req


def _drain_pcm(req):
    out = b""
    while not req.output_audio.empty():
        out += req.output_audio.get()
    return out


def test_k_windows_consumed_in_one_step():
    worker = _worker()
    interval = worker.detokenize_interval  # 4
    req = _req_with_audio(worker, "mc", 5 * interval)
    req.next_audio_decode_idx = [i * interval for i in range(5)]

    worker.run_detokenize([req])
    worker.flush_detokenize()
    # multi_chunk_ks=(4,2): 4 of the 5 windows consumed at once
    assert req.audio_decode_idx == [0, interval, 2 * interval, 3 * interval]
    pcm = _drain_pcm(req)
    assert len(pcm) == 4 * interval * DummyLM.SAMPLES_PER_TOKEN * 2


def test_multi_chunk_matches_sequential_decode():
    """One k=4 combined window must produce the same audio as 4 sequential
    single-window steps (the codec cache advances identically)."""
    interval = 4
    w1 = _worker()
    r1 = _req_with_audio(w1, "a", 4 * interval)
    r1.next_audio_decode_idx = [i * interval for i in range(4)]
    w1.run_detokenize([r1])
    w1.flush_detokenize()
    combined = np.frombuffer(_drain_pcm(r1), np.int16)

    w2 = _worker(multi_chunk_ks=())
    r2 = _req_with_audio(w2, "b", 4 * interval)
    seq = b""
    for i in range(4):
        r2.next_audio_decode_idx = [i * interval]
        w2.run_detokenize([r2])
        w2.flush_detokenize()
        seq += _drain_pcm(r2)
    sequential = np.frombuffer(seq, np.int16)

    assert combined.shape == sequential.shape
    # identical up to float accumulation order (phase cumsum)
    np.testing.assert_allclose(combined, sequential, atol=2)


def test_partial_final_window_in_combined_batch():
    """done request 2.5 windows behind: combined window pads the tail and the
    trim rule emits (last_len - 0.5) / L of the samples."""
    worker = _worker()
    interval = worker.detokenize_interval
    n = 2 * interval + 2  # 2 full windows + 2 frames
    req = _req_with_audio(worker, "p", n)
    req.done_lm_generation = True
    req.finish_reason = "stop"
    req.next_audio_decode_idx = [0, interval, 2 * interval]

    worker.run_detokenize([req])
    worker.flush_detokenize()
    pcm = np.frombuffer(_drain_pcm(req), np.int16)
    L = 3 * interval  # one combined window of k=2? no: k=2 -> 2*interval
    # k buckets (4,2): len(idx)=3 -> k=2 consumed; remaining partial window
    # decodes next step
    assert req.audio_decode_idx == [0, interval]
    assert len(pcm) == 2 * interval * DummyLM.SAMPLES_PER_TOKEN

    req.next_audio_decode_idx = [2 * interval]
    worker.run_detokenize([req])
    worker.flush_detokenize()
    pcm2 = np.frombuffer(_drain_pcm(req), np.int16)
    expect = int(interval * DummyLM.SAMPLES_PER_TOKEN * (2 - 0.5) / interval)
    assert len(pcm2) == expect
    assert req.done_all


def test_detok_frame_budget_caps_wide_long_combos():
    """B*len frame budget: long catch-up windows never use the wide buckets
    (whose activation temps OOM at warmup on a loaded chip); the issue path
    splits across the widest in-budget bucket instead."""
    worker = _worker(detok_buckets_override=(2, 4), detok_frame_budget=8)
    interval = worker.detokenize_interval  # 4
    # at L=interval: 2*4=8 within budget, 4*4=16 over -> cap 2
    assert worker._detok_cap(interval) == 2
    # the smallest bucket is always allowed, even over budget
    assert worker._detok_cap(4 * interval) == 2
    assert worker._detok_bucket(3, interval) == 2  # capped, caller splits
    with_budget_off = _worker(detok_buckets_override=(2, 4),
                              detok_frame_budget=0)
    assert with_budget_off._detok_cap(4 * interval) == 4

    # 3 single-window requests at the capped length split into 2 batches
    reqs = []
    for i in range(3):
        r = _req_with_audio(worker, f"b{i}", interval)
        r.next_audio_decode_idx = [0]
        reqs.append(r)
    worker.run_detokenize(reqs)
    worker.flush_detokenize()
    frames, calls = worker.phase_stats["detok.windows"]
    assert calls == 2 and frames == 3
    for r in reqs:
        pcm = _drain_pcm(r)
        assert len(pcm) == interval * DummyLM.SAMPLES_PER_TOKEN * 2
