"""LM/detokenizer disaggregation over two (virtual) devices."""

import jax
import numpy as np
import pytest

from vox_serve_tpu.models.dummy import DummyLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.scheduler.disaggregation import DisaggregationScheduler
from vox_serve_tpu.worker import ModelWorker, WorkerConfig


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_worker_split_devices():
    model = DummyLM(max_tokens=12)
    cfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=8,
                       prefill_token_buckets=(32,), max_prefill_requests=2,
                       warmup=False, detokenizer_device_index=1)
    worker = ModelWorker(model, cfg)
    assert worker.detokenizer_device != worker.lm_device
    # codec cache lives on the detokenizer device
    cache_dev = list(jax.tree.leaves(worker.codec_cache))[0].devices()
    assert worker.detokenizer_device in cache_dev

    req = Request(request_id="d", prompt="hello disagg")
    worker.run_lm_prefill([req])
    while len(req.lm_output_audio_tokens) < 4 and not req.done_lm_generation:
        worker.run_lm_decode([req])
    if len(req.lm_output_audio_tokens) >= 4:
        req.next_audio_decode_idx = [0]
        worker.run_detokenize([req])
        pcm = req.output_audio.get_nowait()
        assert len(pcm) == model.output_audio_length * 2
    worker.free_kv_cache(req)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_disaggregation_scheduler_requires_two_devices():
    model = DummyLM(max_tokens=12)
    cfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=8,
                       prefill_token_buckets=(32,), warmup=False)
    worker = ModelWorker(model, cfg)  # same device for both
    with pytest.raises(ValueError):
        DisaggregationScheduler(model_worker=worker, max_batch_size=2,
                                connect=False)
