"""TTFA first-chunk minis: a short first window, then regular intervals."""

import numpy as np

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.scheduler.online import OnlineScheduler
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


def test_first_chunk_mini_then_regular_windows():
    model = DummyLM(max_tokens=24)  # interval 4, overlap 0
    cfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=8,
                       prefill_token_buckets=(32,), max_prefill_requests=2,
                       warmup=False, first_chunk_frames=2)
    worker = ModelWorker(model, cfg)
    s = OnlineScheduler(model_worker=worker, max_batch_size=2, connect=False)
    req = Request(request_id="fc", prompt="hello", is_streaming=True)
    s.enqueue_request(req)

    # drive until the first chunk is out
    first_pcm = None
    for _ in range(30):
        s._step()
        if not req.output_audio.empty() or req.chunk_send_timestamps:
            break
    msgs = [m for m in s._inproc_results if m.split(b"|")[1] == b"AUDIO"]
    if not msgs:
        for _ in range(10):
            s._step()
            msgs = [m for m in s._inproc_results
                    if m.split(b"|")[1] == b"AUDIO"]
            if msgs:
                break
    assert msgs, "no audio emitted"
    first_pcm = msgs[0].split(b"|", 2)[2]
    # first chunk = first_chunk_frames (2) frames, not a full interval (4)
    assert len(first_pcm) == 2 * model.SAMPLES_PER_TOKEN * 2
    # the mini emitted before a full interval of frames even existed; the
    # ramp bookkeeping advanced to frame 2
    assert req.extras.get("ramp_next", 0) >= 2 or req.audio_decode_idx

    # run to completion; subsequent chunks are full windows, audio continuous
    for _ in range(80):
        s._step()
        if req.done_all:
            break
    assert req.done_all
    msgs = [m.split(b"|", 2)[2] for m in s._inproc_results
            if m.split(b"|")[1] == b"AUDIO"]
    total = sum(len(m) for m in msgs)
    # ramp minis tile [0, interval) contiguously (overlap 0), then regular
    # windows continue: total samples cover every decoded frame exactly once
    n_frames = len(req.lm_output_audio_tokens)
    assert total >= (2 + 4) * model.SAMPLES_PER_TOKEN * 2 or n_frames < 6
    # no frame decoded twice: total <= n_frames worth of samples
    assert total <= n_frames * model.SAMPLES_PER_TOKEN * 2
