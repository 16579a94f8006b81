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


def test_deferred_row_does_not_consume_streamed_text():
    """A decode row deferred by KV backpressure (or hard-stopped at the
    block-table limit) must not consume a buffered text token or the
    one-shot EOS: the step never executes, so consuming would silently drop
    speech (round-3 review fix — injection now happens after the
    backpressure checks in _plan_decode_row)."""
    model = DummyLM(max_tokens=40)
    cfg = WorkerConfig(max_batch_size=2, num_pages=8, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=2,
                       warmup=False)
    worker = ModelWorker(model, cfg)
    req = Request(request_id="st", prompt="hello world",
                  is_input_streaming=True, is_streaming=True,
                  sampling_config=SamplingConfig(max_tokens=40))
    worker.run_lm_prefill([req])
    worker.sync()
    req.done_lm_generation = False
    req.pending_text_tokens.put(7)
    req.pending_text_tokens.put(8)

    # drain the pool so the next page-boundary growth defers the row
    hold = worker.allocator.alloc(worker.allocator.num_unreserved)
    # place the request exactly at a page boundary
    req.kv_token_len = (req.kv_token_len // 8 + 1) * 8
    before = req.pending_text_tokens.qsize()

    B = 2
    import numpy as np
    overrides = np.zeros((B, model.n_codebooks), np.int32)
    override_mask = np.zeros((B, model.n_codebooks), bool)
    gen_idx = np.zeros((B,), np.int32)
    positions = np.zeros((B,), np.int32)
    page_ids = np.zeros((B,), np.int32)
    offsets = np.zeros((B,), np.int32)
    block_tables = np.zeros((B, worker.max_pages_per_seq), np.int32)
    seq_lens = np.ones((B,), np.int32)
    slot_ids = np.zeros((B,), np.int32)
    hard_stopped = set()
    worker._plan_decode_row(req, 0, overrides, override_mask, gen_idx,
                           positions, page_ids, offsets, block_tables,
                           seq_lens, slot_ids, hard_stopped)
    assert 0 in hard_stopped  # deferred by backpressure
    assert req.pending_text_tokens.qsize() == before  # token NOT consumed
    assert not req.eos_injected

    # same for the one-shot EOS
    while not req.pending_text_tokens.empty():
        req.pending_text_tokens.get()
    req.text_complete = True
    hard_stopped.clear()
    worker._plan_decode_row(req, 0, overrides, override_mask, gen_idx,
                           positions, page_ids, offsets, block_tables,
                           seq_lens, slot_ids, hard_stopped)
    assert 0 in hard_stopped
    assert not req.eos_injected  # EOS still pending for a real step
    worker.allocator.free(hold)


def test_allocator_free_validation():
    """free() validates everything before mutating: double-free, scratch
    page, out-of-range, and duplicate pages all raise without leaking."""
    a = PageAllocator(9)  # pages 1..8 free
    pages = a.alloc(3)
    a.free(pages)
    with pytest.raises(PageAllocatorError):
        a.free([pages[0]])  # double free
    with pytest.raises(PageAllocatorError):
        a.free([0])  # scratch
    with pytest.raises(PageAllocatorError):
        a.free([99])  # out of range
    p = a.alloc(2)
    with pytest.raises(PageAllocatorError):
        a.free([p[0], p[0]])  # duplicate in one call
    assert p[0] not in a._free  # nothing mutated by the failed frees
    a.free(p)
    assert a.num_free == 8


def test_slot_reuse_resets_repetition_and_codec_state():
    """A reused slot must not leak the previous occupant's state: the
    repetition-penalty appearance cache (global window ORs forever) and the
    streaming codec cache (crossfade with the prior request's audio tail)."""
    import jax.numpy as jnp

    model = DummyLM(max_tokens=8)
    model.sampling_config = SamplingConfig(
        greedy=True, max_tokens=8, repetition_penalty=2.0,
        repetition_window=-1)
    cfg = WorkerConfig(max_batch_size=1, num_pages=32, page_size=8,
                       prefill_token_buckets=(64,), max_prefill_requests=1,
                       warmup=False)
    w = ModelWorker(model, cfg)

    r1 = Request(request_id="a", prompt="first occupant",
                 sampling_config=model.sampling_config)
    w.run_lm_prefill([r1])
    for _ in range(6):
        r1.done_lm_generation = False
        w.run_lm_decode([r1])
    w.sync()
    slot = r1.slot
    if w.rep_cache is not None:
        assert int(np.asarray(w.rep_cache[slot]).sum()) >= 2  # history built
    w.free_kv_cache(r1)

    # dirty the codec cache row to simulate streaming state left behind
    if w.codec_cache is not None:
        import jax
        w.codec_cache = jax.tree.map(
            lambda a: a.at[slot].set(jnp.ones((), a.dtype)), w.codec_cache)

    r2 = Request(request_id="b", prompt="second occupant",
                 sampling_config=model.sampling_config)
    w.run_lm_prefill([r2])
    w.sync()
    assert r2.slot == slot  # same slot reused
    if w.codec_cache is not None:
        import jax
        leaves = jax.tree.leaves(jax.tree.map(
            lambda a: float(jnp.abs(a[slot]).sum()), w.codec_cache))
        assert all(v == 0.0 for v in leaves), "codec cache row not zeroed"
    if w.rep_cache is not None:
        # row re-initialized from zero: only B's first sampled token(s) set
        row = np.asarray(w.rep_cache[slot])
        assert row.sum() <= row.shape[-2]  # at most one token per codebook
