"""Per-request failure isolation inside a batch (VERDICT r2 weak #6).

One poisoned request (malformed host-side state) in a full batch must fail
alone; co-batched streams complete normally with their audio intact.
"""

import numpy as np

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.scheduler.base import Scheduler
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


def _worker(**kw):
    model = DummyLM(max_tokens=16)
    cfg = WorkerConfig(max_batch_size=4, num_pages=64, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=4,
                       warmup=False, **kw)
    return ModelWorker(model, cfg)


def _drive(sched, reqs, max_steps=200):
    for r in reqs:
        sched.enqueue_request(r)
    for _ in range(max_steps):
        sched._step()
        if all(r.done_all for r in reqs):
            break
    return sched._inproc_results


def test_poisoned_decode_request_fails_alone():
    w = _worker()
    s = Scheduler(model_worker=w, max_batch_size=4, connect=False)
    reqs = [Request(request_id=f"d{i}", prompt=f"prompt {i}")
            for i in range(4)]
    for r in reqs:
        s.enqueue_request(r)
    # prefill everyone, then poison one request's host state so its decode
    # planning raises (kv_pages emptied -> IndexError on page lookup)
    for _ in range(10):
        s._step()
        if all(r.done_lm_prefill for r in reqs):
            break
    victim = reqs[1]
    victim.kv_pages = []
    victim.kv_token_len = 3  # not a page boundary -> no alloc, direct lookup
    for _ in range(200):
        s._step()
        if all(r.done_all for r in reqs):
            break
    msgs = s._inproc_results
    assert victim.done_all
    assert "error" in (victim.finish_reason or "")
    for r in reqs:
        if r is victim:
            continue
        assert r.done_all
        assert not (r.finish_reason or "").startswith("error"), r.finish_reason
        audio = b"".join(m.split(b"|", 2)[2] for m in msgs
                         if m.startswith(r.request_id.encode())
                         and m.split(b"|")[1] == b"AUDIO")
        assert len(audio) > 0
    comps = {m.split(b"|")[0].decode() for m in msgs
             if m.split(b"|")[1] == b"COMPLETION"}
    assert comps == {r.request_id for r in reqs}


def test_poisoned_detokenize_request_fails_alone():
    w = _worker()
    s = Scheduler(model_worker=w, max_batch_size=4, connect=False)
    reqs = [Request(request_id=f"t{i}", prompt=f"prompt {i}")
            for i in range(4)]
    for r in reqs:
        s.enqueue_request(r)
    for _ in range(6):
        s._step()
    victim = reqs[2]
    # corrupt the newest token row so np.stack in detok window planning
    # raises (the tail is always part of a future window; earlier rows may
    # already be consumed now that prefills pack into one round)
    if victim.lm_output_audio_tokens:
        victim.lm_output_audio_tokens[-1] = np.zeros((7, 3), np.int32)
    else:
        victim.lm_output_audio_tokens.append(np.zeros((7, 3), np.int32))
        victim.lm_output_audio_tokens.append(np.zeros((2,), np.int32))
    for _ in range(200):
        s._step()
        if all(r.done_all for r in reqs):
            break
    assert victim.done_all and "error" in (victim.finish_reason or "")
    for r in reqs:
        if r is victim:
            continue
        assert r.done_all
        assert not (r.finish_reason or "").startswith("error"), r.finish_reason
    # resources released for everyone, including the victim
    for r in reqs:
        assert r.slot is None and not r.kv_pages
