import json
import queue

import numpy as np
import pytest

from vox_serve_tpu.requests import Request
from vox_serve_tpu.scheduler.base import Scheduler
from vox_serve_tpu.scheduler.offline import OfflineScheduler
from vox_serve_tpu.scheduler.online import OnlineScheduler


class FakeWorker:
    """Policy-level stand-in: 'generates' canned tokens, no device work."""

    def __init__(self, interval=4, overlap=0, max_prefill_tokens=64):
        self.detokenize_interval = interval
        self.detokenize_overlap = overlap
        self.max_prefill_tokens = max_prefill_tokens
        self.supports_audio_input = False
        self.prefills = []
        self.decodes = []
        self.detoks = []

        class _M:
            sample_rate = 16000
            n_channels = 1
            supports_input_streaming = False
            model_name = "fake"
        self.model = _M()

    def can_admit(self, n):
        return True

    def run_lm_prefill(self, reqs):
        self.prefills.append(list(reqs))
        for r in reqs:
            if r.input_tokens is None:
                r.input_tokens = np.zeros((4, 1), np.int32)
                r.input_length = 4
            r.done_lm_prefill = True
            tok = np.array([7], np.int32)
            r.lm_output_tokens.append(tok)
            r.lm_output_audio_tokens.append(tok)

    def run_lm_decode(self, reqs):
        self.decodes.append(list(reqs))
        for r in reqs:
            tok = np.array([7], np.int32)
            r.lm_output_tokens.append(tok)
            r.lm_output_audio_tokens.append(tok)
            if len(r.lm_output_tokens) >= 12:
                r.done_lm_generation = True

    def run_detokenize(self, reqs):
        self.detoks.append(list(reqs))
        for r in reqs:
            r.audio_decode_idx = list(r.next_audio_decode_idx)
            for _ in r.audio_decode_idx:
                r.output_audio.put(b"\x00" * 640)
            if r.done_lm_generation and r.audio_decode_idx and (
                r.audio_decode_idx[-1] + self.detokenize_interval
                >= len(r.lm_output_audio_tokens)
            ):
                r.done_all = True
        return list(reqs)

    def flush_detokenize(self):
        return []

    def free_kv_cache(self, req):
        req.kv_pages = []
        req.slot = None


def _sched(cls=Scheduler, **kw):
    return cls(model_worker=FakeWorker(), max_batch_size=4, connect=False, **kw)


def test_prefill_has_priority_and_is_exclusive():
    s = _sched()
    new = Request(request_id="a", prompt="hi")
    running = Request(request_id="b", prompt="x", done_lm_prefill=True)
    running.lm_output_tokens.append(np.array([1], np.int32))
    s.active_requests = [running, new]
    sel = s._select_lm_requests()
    assert sel == [new]  # one prefill, no decode piggyback


def test_decode_batch_caps_at_max_batch_size():
    s = _sched()
    reqs = []
    for i in range(6):
        r = Request(request_id=str(i), done_lm_prefill=True)
        r.lm_output_tokens.append(np.array([1], np.int32))
        reqs.append(r)
    s.active_requests = reqs
    sel = s._select_lm_requests()
    assert len(sel) == 4


def test_detokenize_window_selection():
    s = _sched()
    r = Request(request_id="a", done_lm_prefill=True)
    r.lm_output_audio_tokens = [np.array([1], np.int32)] * 9
    s.active_requests = [r]
    sel = s._select_detokenize_requests()
    assert sel == [r] and r.next_audio_decode_idx == [0]
    # simulate one detokenize done
    r.audio_decode_idx = [0]
    sel2 = s._select_detokenize_requests()
    assert sel2 == [r] and r.next_audio_decode_idx == [4]
    # only 1 token beyond idx 8 -> not enough for full window, not done
    r.audio_decode_idx = [4]
    r.next_audio_decode_idx = [4]
    assert s._select_detokenize_requests() == []
    # generation done -> final partial window scheduled
    r.done_lm_generation = True
    sel3 = s._select_detokenize_requests()
    assert sel3 == [r] and r.next_audio_decode_idx == [8]


def test_full_loop_completes_request():
    s = _sched()
    req = Request(request_id="r", prompt="hello", is_streaming=True)
    s.enqueue_request(req)
    for _ in range(40):
        s._step()
        if req.done_all:
            break
    assert req.done_all
    msgs = s._inproc_results
    kinds = [m.split(b"|")[1] for m in msgs]
    assert b"AUDIO" in kinds
    assert kinds[-1] == b"COMPLETION"
    comp = json.loads(msgs[-1].split(b"|", 2)[2])
    assert comp["status"] == "completed"


def test_online_pressing_priority():
    s = _sched(OnlineScheduler)
    pressing = Request(request_id="p", done_lm_prefill=True, is_streaming=True,
                       is_pressing=True)
    pressing.lm_output_tokens.append(np.array([1], np.int32))
    idle = []
    for i in range(4):
        r = Request(request_id=f"i{i}", done_lm_prefill=True)
        r.lm_output_tokens.append(np.array([1], np.int32))
        idle.append(r)
    s.active_requests = idle + [pressing]
    sel = s._select_lm_requests()
    assert sel[0] is pressing  # critical first, background piggybacked
    assert len(sel) == 4


def test_online_detok_proportional_allocation():
    s = _sched(OnlineScheduler)
    a = Request(request_id="a", done_lm_prefill=True, is_streaming=True,
                is_pressing=True)
    a.lm_output_audio_tokens = [np.array([1], np.int32)] * 20
    b = Request(request_id="b", done_lm_prefill=True, is_streaming=True,
                is_pressing=True)
    b.lm_output_audio_tokens = [np.array([1], np.int32)] * 20
    s.active_requests = [a, b]
    sel = s._select_detokenize_requests()
    assert set(x.request_id for x in sel) == {"a", "b"}
    total_chunks = len(a.next_audio_decode_idx) + len(b.next_audio_decode_idx)
    assert total_chunks <= s.detokenize_max_batch_size
    assert len(a.next_audio_decode_idx) >= 1
    assert len(b.next_audio_decode_idx) >= 1


def test_online_background_detok_when_no_pressing():
    """Non-pressing (non-streaming) requests get the whole detok budget when
    no pressing stream needs it — an early return here used to starve them
    forever on a stream-free server (request never reached done_all)."""
    s = _sched(OnlineScheduler)
    a = Request(request_id="a", done_lm_prefill=True)  # not streaming
    a.lm_output_audio_tokens = [np.array([1], np.int32)] * 8
    s.active_requests = [a]
    sel = s._select_detokenize_requests()
    assert sel == [a]
    assert len(a.next_audio_decode_idx) >= 1


def test_online_detok_gate_defers_until_deadline_near():
    """Latency-regime deadline-driven detok batching: streams with >margin
    of buffered playback defer their windows (small detok dispatches cost
    45-70 ms of round time against ~20 ms decode steps); a stream within
    margin of underrun makes the whole ready set dispatch at once. First
    chunks, finished streams, and non-streaming requests never defer."""
    import time as _time

    s = _sched(OnlineScheduler)
    s._detok_gate_margin_s = 0.6  # opt-in knob (default off)
    now = _time.time()

    def stream(rid, buffered_s):
        r = Request(request_id=rid, done_lm_prefill=True, is_streaming=True,
                    is_pressing=True)
        r.lm_output_audio_tokens = [np.array([1], np.int32)] * 20
        # one chunk already sent whose playback ends `buffered_s` from now
        r.chunk_send_timestamps = [now]
        r.chunk_durations = [buffered_s]
        r.next_audio_decode_idx = [0]
        r.audio_decode_idx = [0]
        return r

    # all streams comfortably buffered (5 s > 0.6 s margin): defer
    a, b = stream("a", 5.0), stream("b", 5.0)
    s.active_requests = [a, b]
    assert s._select_detokenize_requests() == []
    assert s._detok_defer_rounds == 1

    # one stream near underrun: everyone's ready windows dispatch together
    c = stream("c", 0.3)
    s.active_requests = [a, b, c]
    sel = s._select_detokenize_requests()
    assert set(x.request_id for x in sel) == {"a", "b", "c"}
    assert s._detok_defer_rounds == 0

    # throughput regime: gate is off (fused-round cap logic owns batching)
    s.active_requests = [stream("d", 5.0)]
    s._regime_fused = True
    assert len(s._select_detokenize_requests()) == 1

    # finished stream (tail flush frees KV): never deferred
    s._regime_fused = False
    e = stream("e", 5.0)
    e.done_lm_generation = True
    s.active_requests = [stream("f", 5.0), e]
    assert len(s._select_detokenize_requests()) == 2

    # gate disabled by env knob
    s2 = _sched(OnlineScheduler)
    s2._detok_gate_margin_s = 0.0
    s2.active_requests = [stream("g", 5.0)]
    assert len(s2._select_detokenize_requests()) == 1


def test_offline_defers_detok_until_lm_done():
    s = _sched(OfflineScheduler)
    a = Request(request_id="a", done_lm_prefill=True)
    a.lm_output_audio_tokens = [np.array([1], np.int32)] * 8
    s.active_requests = [a]
    assert s._select_detokenize_requests() == []  # LM ongoing
    a.done_lm_generation = True
    sel = s._select_detokenize_requests()
    assert sel == [a]
    assert a.next_audio_decode_idx == [0, 4]  # packs all available chunks


def test_request_payload_parsing():
    s = _sched()
    payload = json.dumps({
        "request_id": "x1", "prompt": "hi there", "is_streaming": True,
        "model_kwargs": {"speaker": "vivian"},
    }).encode() + b"|body"
    req = s._handle_request_payload(payload)
    assert req.request_id == "x1"
    assert req.is_streaming and req.is_pressing
    assert req.model_kwargs == {"speaker": "vivian"}
    assert s._handle_request_payload(b"garbage-no-delimiter") is None


def test_duplicate_request_id_does_not_crash_selection():
    """Two distinct live Requests sharing a request_id (client retry) used
    to crash detok selection: dataclass field equality reached numpy-array
    fields in `req in selected` (ValueError). Request is eq=False now."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    w = ModelWorker(DummyLM(max_tokens=12), WorkerConfig(
        max_batch_size=4, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4, warmup=False))
    s = OnlineScheduler(model_worker=w, max_batch_size=4, connect=False)
    r1 = Request(request_id="dup", prompt="same prompt")
    r2 = Request(request_id="dup", prompt="same prompt")
    s.enqueue_request(r1)
    s.enqueue_request(r2)
    for _ in range(200):
        s._step()
        if r1.done_all and r2.done_all:
            break
    assert r1.done_all and r2.done_all
    assert r1 != r2  # identity semantics


def test_under_load_audio_resolves_without_full_sync():
    """Under load (>2 active streams) the scheduler must NOT drain the
    dispatch pipeline for first chunks (the r5 eager-sync variant stalled
    every live stream once per admission — HTTP all-chunks viability
    95.8% -> 22-32% at rate 1, artifacts/goodput_tpu_r5_run1.json). A
    churned admission's audio surfaces through the non-blocking
    poll_resolved path instead, within a few rounds of dispatch."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.sampling import SamplingConfig
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    def mk(i, n=40):
        return Request(request_id=f"p{i}", prompt="warm stream",
                       is_streaming=True, is_pressing=True,
                       sampling_config=SamplingConfig(
                           greedy=True, max_tokens=n))

    m = DummyLM(max_tokens=64)
    m.sampling_config = SamplingConfig(greedy=True, max_tokens=64)
    w = ModelWorker(m, WorkerConfig(
        max_batch_size=8, num_pages=128, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4,
        warmup=False, first_chunk_frames=2, pipeline_depth=2,
        fused_decode_steps=2, fused_decode_buckets=(1, 8)))
    s = OnlineScheduler(model_worker=w, max_batch_size=8, connect=False)
    syncs = []
    orig_sync = w.sync
    w.sync = lambda: (syncs.append(1), orig_sync())[1]

    for i in range(4):
        s.enqueue_request(mk(i))
    for _ in range(8):  # all four live and decoding
        s._step()
    assert sum(1 for r in s.active_requests if r.done_lm_prefill) >= 3
    syncs.clear()
    late = mk(99, n=30)
    s.enqueue_request(late)
    steps_to_audio = None
    for i in range(20):
        s._step()
        if "first_audio" in late.lifecycle:
            steps_to_audio = i
            break
    assert steps_to_audio is not None, "admission never produced audio"
    # CPU jax computes eagerly, so the poll path must surface the chunk
    # within the dispatch-pipeline depth worth of rounds
    assert steps_to_audio <= 6
    assert not syncs, "full pipeline sync ran despite >2 active streams"


def test_poll_resolved_empties_pipeline_in_order():
    """poll_resolved resolves front-first and leaves host token state
    identical to a blocking sync."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.sampling import SamplingConfig
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    m = DummyLM(max_tokens=32)
    m.sampling_config = SamplingConfig(greedy=True, max_tokens=32)
    w = ModelWorker(m, WorkerConfig(
        max_batch_size=2, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=2,
        warmup=False, pipeline_depth=3))
    req = Request(request_id="pr", prompt="poll me",
                  sampling_config=SamplingConfig(greedy=True, max_tokens=32))
    w.run_lm_prefill([req])
    for _ in range(3):
        w.run_lm_decode([req])
    assert w._pending  # pipeline holds in-flight steps
    import time as _t
    for _ in range(50):
        w.poll_resolved()
        if not w._pending:
            break
        _t.sleep(0.01)  # let the async dispatch thread run (1-core host)
    assert not w._pending, "poll_resolved never drained a completed pipeline"
    n_polled = len(req.lm_output_tokens)
    assert n_polled >= 3  # prefill + 3 decode steps resolved, minus pipeline


def test_fused_min_batch_regime_boundary():
    """Below fused_min_batch the scheduler dispatches single-step rounds
    (fine granularity for early-chunk deadlines); at/above it fuses k."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    w = ModelWorker(DummyLM(max_tokens=16), WorkerConfig(
        max_batch_size=8, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4, warmup=False,
        fused_decode_steps=4, fused_decode_buckets=(1, 8),
        fused_min_batch=3))
    s = OnlineScheduler(model_worker=w, max_batch_size=8, connect=False)
    reqs = [Request(request_id=f"m{i}", prompt="x") for i in range(4)]
    assert s._fused_decode_steps(reqs[:2]) == 1  # latency regime
    assert s._fused_decode_steps(reqs[:3]) == 4  # throughput regime
    assert s._fused_decode_steps(reqs) == 4


def test_loaded_admission_first_chunk_is_full_window():
    """At/above fused_min_batch, a new stream skips the mini ramp: its
    first chunk is a FULL detokenize window, so the client playback clock
    starts with interval frames of buffer (the tiny ramped first chunk
    under load made chunk 2 structurally miss its deadline — rate-1 HTTP
    all-chunks viability 22-32%, artifacts/goodput_tpu_r5_run1.json)."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.sampling import SamplingConfig
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    m = DummyLM(max_tokens=48)
    m.sampling_config = SamplingConfig(greedy=True, max_tokens=48)
    w = ModelWorker(m, WorkerConfig(
        max_batch_size=8, num_pages=128, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4,
        warmup=False, first_chunk_frames=2,
        fused_decode_steps=2, fused_decode_buckets=(1, 8),
        fused_min_batch=2))
    s = OnlineScheduler(model_worker=w, max_batch_size=8, connect=False)
    warm = [Request(request_id=f"w{i}", prompt="warm",
                    is_streaming=True, is_pressing=True,
                    sampling_config=SamplingConfig(greedy=True,
                                                   max_tokens=40))
            for i in range(3)]
    for r in warm:
        s.enqueue_request(r)
    for _ in range(6):
        s._step()
    assert sum(1 for r in s.active_requests if r.done_lm_prefill) >= 2
    late = Request(request_id="late", prompt="under load",
                   is_streaming=True, is_pressing=True,
                   sampling_config=SamplingConfig(greedy=True,
                                                  max_tokens=30))
    s.enqueue_request(late)
    for _ in range(40):
        s._step()
        if late.chunk_send_timestamps:
            break
    msgs = [m_ for m_ in s._inproc_results
            if m_.startswith(b"late|AUDIO")]
    assert msgs, "loaded admission never produced audio"
    first = msgs[0].split(b"|", 2)[2]
    interval = m.detokenize_interval
    # full window, not the 2-frame mini
    assert len(first) == interval * m.SAMPLES_PER_TOKEN * 2, (
        len(first), interval * m.SAMPLES_PER_TOKEN * 2)
    # light-load control: with only one live stream the ramp stays
    w2 = ModelWorker(DummyLM(max_tokens=48), WorkerConfig(
        max_batch_size=8, num_pages=128, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4,
        warmup=False, first_chunk_frames=2,
        fused_decode_steps=2, fused_decode_buckets=(1, 8),
        fused_min_batch=2))
    w2.model.sampling_config = SamplingConfig(greedy=True, max_tokens=48)
    s2 = OnlineScheduler(model_worker=w2, max_batch_size=8, connect=False)
    solo = Request(request_id="solo", prompt="light load",
                   is_streaming=True, is_pressing=True,
                   sampling_config=SamplingConfig(greedy=True,
                                                  max_tokens=30))
    s2.enqueue_request(solo)
    for _ in range(40):
        s2._step()
        if solo.chunk_send_timestamps:
            break
    msgs2 = [m_ for m_ in s2._inproc_results
             if m_.startswith(b"solo|AUDIO")]
    assert msgs2
    first2 = msgs2[0].split(b"|", 2)[2]
    assert len(first2) == 2 * w2.model.SAMPLES_PER_TOKEN * 2


def test_regime_hysteresis_latch():
    """The latency/throughput regime flips up at fused_min_batch and down
    at 2/3 of it — load hovering at the boundary must not flap (the rate-2/4
    viability dip in artifacts/goodput_tpu_r5_run4.json)."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    w = ModelWorker(DummyLM(max_tokens=16), WorkerConfig(
        max_batch_size=8, num_pages=64, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4, warmup=False,
        fused_decode_steps=4, fused_decode_buckets=(1, 8),
        fused_min_batch=6))
    s = OnlineScheduler(model_worker=w, max_batch_size=8, connect=False)
    assert not s._throughput_regime(5, 6)
    assert s._throughput_regime(6, 6)        # flip up at fmin
    assert s._throughput_regime(5, 6)        # stays fused at fmin-1
    assert s._throughput_regime(4, 6)        # 2/3 of 6 = 4: still fused
    assert not s._throughput_regime(3, 6)    # below 2/3: flip down
    assert not s._throughput_regime(5, 6)    # stays latency until fmin
    reqs = [Request(request_id=f"h{i}", prompt="x") for i in range(6)]
    assert s._fused_decode_steps(reqs[:5]) == 1
    assert s._fused_decode_steps(reqs) == 4
    assert s._fused_decode_steps(reqs[:5]) == 4  # latched


def test_admission_backlog_counts_as_regime_load():
    """A saturation wave (live decode 0, many queued admissions) must NOT
    take the mini ramp: the backlog will be decoding within a few rounds,
    and ramped first chunks would then face fused-round granularity
    (measured as the rate-6/10 per-chunk viability collapse, goodput run7
    vs run4). Backlog feeds the regime latch via _load_pressure."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.sampling import SamplingConfig
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    m = DummyLM(max_tokens=48)
    m.sampling_config = SamplingConfig(greedy=True, max_tokens=48)
    w = ModelWorker(m, WorkerConfig(
        max_batch_size=8, num_pages=128, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4,
        warmup=False, first_chunk_frames=2,
        fused_decode_steps=2, fused_decode_buckets=(1, 8),
        fused_min_batch=3))
    s = OnlineScheduler(model_worker=w, max_batch_size=8, connect=False)
    wave = [Request(request_id=f"wave{i}", prompt="burst",
                    is_streaming=True, is_pressing=True,
                    sampling_config=SamplingConfig(greedy=True,
                                                   max_tokens=40))
            for i in range(6)]
    for r in wave:
        s.enqueue_request(r)
    for _ in range(50):
        s._step()
        if wave[0].chunk_send_timestamps:
            break
    msgs = [m_ for m_ in s._inproc_results
            if m_.startswith(b"wave0|AUDIO")]
    assert msgs, "wave admission never produced audio"
    first = msgs[0].split(b"|", 2)[2]
    interval = m.detokenize_interval
    # full window first chunk (ramp skipped), despite decoding==0 at the
    # moment the wave admitted
    assert len(first) == interval * m.SAMPLES_PER_TOKEN * 2, (
        len(first), interval * m.SAMPLES_PER_TOKEN * 2)


def test_upflip_graduates_ramping_streams():
    """When the regime latch flips to throughput, mid-ramp streams hand
    off to regular full windows from their current ramp position (no
    re-decoded frames, no further minis), and not-yet-started streams get
    ramp-skip semantics — a flip must never leave a stream serving 3-frame
    chunks at fused-round granularity (rate-8 all-chunks 54.6% in goodput
    run9)."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.sampling import SamplingConfig
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    m = DummyLM(max_tokens=48)
    m.sampling_config = SamplingConfig(greedy=True, max_tokens=48)
    w = ModelWorker(m, WorkerConfig(
        max_batch_size=8, num_pages=128, page_size=8,
        prefill_token_buckets=(64,), max_prefill_requests=4,
        warmup=False, first_chunk_frames=2,
        fused_decode_steps=2, fused_decode_buckets=(1, 8),
        fused_min_batch=4))
    s = OnlineScheduler(model_worker=w, max_batch_size=8, connect=False)
    interval = m.detokenize_interval
    step = interval - m.detokenize_overlap

    mid = Request(request_id="mid", prompt="x", is_streaming=True)
    mid.extras["ramp_next"] = 2  # one 2-frame mini already sent
    fresh = Request(request_id="fresh", prompt="x", is_streaming=True)
    pending = Request(request_id="pend", prompt="x", is_streaming=True)
    pending.extras["ramp_next"] = 2
    pending.extras["mini_chunk"] = True  # selected this round: untouched
    s.active_requests = [mid, fresh, pending]

    assert s._throughput_regime(5, 4)  # up-flip
    assert mid.extras["ramp_next"] == (w.ramp_frames or interval)
    assert mid.next_audio_decode_idx == [2 - step]  # next window at frame 2
    assert fresh.extras["ramp_next"] == (w.ramp_frames or interval)
    assert not fresh.next_audio_decode_idx  # full first window from 0
    assert pending.extras["ramp_next"] == 2  # pending mini untouched
