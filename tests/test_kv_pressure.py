"""KV-pool pressure and per-request error isolation.

Round-2 hardening (VERDICT next-round #7, ADVICE high): generation-budget
pages are reserved at admission so decode-phase page growth can never exhaust
the pool; per-request failures (oversized prompt, preprocess error) produce
error COMPLETIONs instead of killing the scheduler daemon.
"""

import json

import numpy as np
import pytest

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.ops.kv_cache import PageAllocator, PageAllocatorError
from vox_serve_tpu.requests import Request
from vox_serve_tpu.sampling import SamplingConfig
from vox_serve_tpu.scheduler.base import Scheduler
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


def test_allocator_reservations():
    a = PageAllocator(17)  # 16 usable
    a.reserve(8)
    assert a.num_unreserved == 8
    assert a.can_alloc(8) and not a.can_alloc(9)
    # reserved draw-down frees headroom
    pages = a.alloc(4, reserved=4)
    assert len(pages) == 4 and a.num_unreserved == 8
    a.free(pages)
    assert a.num_unreserved == 12
    a.reserve(12)
    with pytest.raises(PageAllocatorError):
        a.reserve(1)
    with pytest.raises(PageAllocatorError):
        a.alloc(1)
    a.release_reservation(16)
    assert a.num_unreserved == 16


def _scheduler(num_pages=24, max_tokens=40):
    model = DummyLM(max_tokens=max_tokens)
    cfg = WorkerConfig(max_batch_size=4, num_pages=num_pages, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=4,
                       warmup=False)
    worker = ModelWorker(model, cfg)
    return Scheduler(worker, max_batch_size=4, connect=False)


def _drive(sched, max_steps=400):
    for _ in range(max_steps):
        sched._step()
        if not sched.active_requests:
            break
    return sched._inproc_results


def _completions(results):
    out = {}
    for msg in results:
        rid, typ, body = msg.split(b"|", 2)
        if typ == b"COMPLETION":
            out[rid.decode()] = json.loads(body)
    return out


def test_pool_exhaustion_defers_then_serves_all():
    """More concurrent requests than the pool can hold: admission must defer
    (not crash), and every request still completes once pages free up."""
    sched = _scheduler(num_pages=24, max_tokens=40)
    for i in range(5):
        sched.enqueue_request(Request(
            request_id=f"r{i}", prompt="hello world " * 2,
            sampling_config=SamplingConfig(max_tokens=40)))
    results = _drive(sched)
    comps = _completions(results)
    assert set(comps) == {f"r{i}" for i in range(5)}
    for c in comps.values():
        assert not c["reason"].startswith("error"), c


def test_oversized_prompt_fails_only_that_request():
    """A prompt longer than the largest prefill bucket gets an error
    COMPLETION; the daemon keeps serving the rest."""
    sched = _scheduler()
    sched.enqueue_request(Request(request_id="big", prompt="x " * 500,
                                  sampling_config=SamplingConfig(max_tokens=600)))
    sched.enqueue_request(Request(request_id="ok", prompt="hi there",
                                  sampling_config=SamplingConfig(max_tokens=40)))
    comps = _completions(_drive(sched))
    assert set(comps) == {"big", "ok"}
    assert comps["big"]["reason"].startswith("error")
    assert not comps["ok"]["reason"].startswith("error")


def test_preprocess_exception_is_isolated():
    sched = _scheduler()
    model = sched.model_worker.model
    orig = model.preprocess

    def boom(prompt=None, audio_path=None, **kw):
        if prompt == "__boom__":
            raise RuntimeError("tokenizer exploded")
        return orig(prompt, audio_path, **kw)

    model.preprocess = boom
    sched.enqueue_request(Request(request_id="bad", prompt="__boom__"))
    sched.enqueue_request(Request(request_id="good", prompt="fine",
                                  sampling_config=SamplingConfig(max_tokens=40)))
    comps = _completions(_drive(sched))
    assert comps["bad"]["reason"].startswith("error")
    assert not comps["good"]["reason"].startswith("error")


def test_decode_page_growth_never_exhausts():
    """Generation runs to the cap with a pool sized exactly to the admission
    reservation — decode growth must draw from the reservation."""
    sched = _scheduler(num_pages=16, max_tokens=64)
    sched.enqueue_request(Request(request_id="solo", prompt="abcd",
                                  sampling_config=SamplingConfig(max_tokens=64)))
    comps = _completions(_drive(sched))
    assert set(comps) == {"solo"}
    assert not comps["solo"]["reason"].startswith("error")
