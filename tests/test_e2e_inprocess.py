"""End-to-end: DummyLM -> ModelWorker -> Scheduler, in-process (no ZMQ)."""

import json

import numpy as np
import pytest

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.scheduler.base import Scheduler
from vox_serve_tpu.scheduler.input_streaming import InputStreamingScheduler
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


@pytest.fixture(scope="module")
def worker():
    model = DummyLM(max_tokens=12)
    cfg = WorkerConfig(max_batch_size=4, num_pages=64, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=4,
                       warmup=False)
    return ModelWorker(model, cfg)


def drive(sched, reqs, max_steps=120):
    for r in reqs:
        sched.enqueue_request(r)
    for _ in range(max_steps):
        sched._step()
        if all(r.done_all for r in reqs):
            break
    return sched._inproc_results


def test_single_request_end_to_end(worker):
    s = Scheduler(model_worker=worker, max_batch_size=4, connect=False)
    req = Request(request_id="e2e1", prompt="hello tpu world")
    msgs = drive(s, [req])
    assert req.done_all
    audio = b"".join(m.split(b"|", 2)[2] for m in msgs
                     if m.split(b"|")[1] == b"AUDIO" and m.startswith(b"e2e1"))
    assert len(audio) > 0 and len(audio) % 2 == 0
    x = np.frombuffer(audio, np.int16)
    assert np.abs(x).max() > 500  # real signal
    comps = [m for m in msgs if m.split(b"|")[1] == b"COMPLETION"]
    assert len(comps) == 1
    assert json.loads(comps[0].split(b"|", 2)[2])["status"] == "completed"


def test_concurrent_requests_complete(worker):
    s = Scheduler(model_worker=worker, max_batch_size=4, connect=False)
    reqs = [Request(request_id=f"c{i}", prompt=f"prompt number {i}")
            for i in range(3)]
    drive(s, reqs)
    for r in reqs:
        assert r.done_all, r
        assert r.slot is None and not r.kv_pages  # resources released


def test_input_streaming_end_to_end():
    model = DummyLM(max_tokens=40)
    cfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=2,
                       warmup=False)
    worker = ModelWorker(model, cfg)
    s = InputStreamingScheduler(model_worker=worker, max_batch_size=2,
                                connect=False)
    rid = "stream1"
    s._handle_message(rid.encode() + b"|TEXT_STREAM_START|{}")
    req = s._streams[rid]
    # below the 20-char threshold: no prefill yet
    s._handle_message(rid.encode() + b"|TEXT_UPDATE|short text")
    s._step()
    assert not req.done_lm_prefill
    # crossing the threshold triggers minimal prefill (1 token)
    s._handle_message(rid.encode() + b"|TEXT_UPDATE| and now much longer")
    s._step()
    assert req.prefill_ready
    assert req.input_length == 1
    for _ in range(6):
        s._step()
    assert req.done_lm_prefill
    gen_before = req.num_generated
    # drain the queue; generation should pause while waiting for text
    for _ in range(40):
        s._step()
        if req.pending_text_tokens.empty():
            break
    steps_paused = req.num_generated
    s._step(); s._step()
    assert req.num_generated <= steps_paused + 1  # paused (maybe 1 in flight)
    assert gen_before <= req.num_generated
    # complete the stream: EOS injected, generation finishes
    s._handle_message(rid.encode() + b"|TEXT_COMPLETE|")
    for _ in range(60):
        s._step()
        if req.done_all:
            break
    assert req.done_all
    assert req.eos_injected


def test_non_streaming_completes_under_online_scheduler(worker):
    """Regression: the online scheduler's detok selection starved
    non-pressing (non-streaming) requests when no pressing stream existed —
    the request generated tokens but never detokenized or completed."""
    from vox_serve_tpu.scheduler.online import OnlineScheduler

    s = OnlineScheduler(model_worker=worker, max_batch_size=4, connect=False)
    req = Request(request_id="bg1", prompt="plain generate request")
    msgs = drive(s, [req])
    assert req.done_all
    audio = b"".join(m.split(b"|", 2)[2] for m in msgs
                     if m.split(b"|")[1] == b"AUDIO" and m.startswith(b"bg1"))
    assert len(audio) > 0


def test_empty_input_stream_completes():
    """A text stream opened then closed with no usable text must complete
    (empty_stream) instead of sitting paused forever."""
    from vox_serve_tpu.scheduler.input_streaming import InputStreamingScheduler
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    w = ModelWorker(DummyLM(max_tokens=12), WorkerConfig(
        max_batch_size=4, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4, warmup=False))
    s = InputStreamingScheduler(model_worker=w, max_batch_size=4,
                                connect=False)
    s._handle_message(b"er1|TEXT_STREAM_START|{}")
    s._handle_message(b"er1|TEXT_COMPLETE|")
    comps = [m for m in s._inproc_results if m.split(b"|")[1] == b"COMPLETION"]
    assert len(comps) == 1
    assert not s.active_requests
    assert "er1" not in s._streams
