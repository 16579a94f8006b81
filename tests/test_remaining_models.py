"""Chatterbox / GLM-4-Voice / Step-Audio-2 (small dims) through the worker."""

import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.cosyvoice_flow import CosyFlowConfig
from vox_serve_tpu.codecs.glm_flow import GLMFlowConfig
from vox_serve_tpu.codecs.step_dit import StepFlowConfig
from vox_serve_tpu.codecs.hifigan import HiFTConfig
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.chatterbox import (
    COND_LEN, START_SPEECH, STOP_SPEECH, ChatterboxLM,
)
from vox_serve_tpu.models.glm_voice import AUDIO_OFFSET as GLM_AUDIO_OFFSET
from vox_serve_tpu.models.glm_voice import STOP_IDS as GLM_STOPS
from vox_serve_tpu.models.glm_voice import GLMVoiceLM
from vox_serve_tpu.models.step_audio_2 import AUDIO_OFFSET as STEP_AUDIO_OFFSET
from vox_serve_tpu.models.step_audio_2 import StepAudio2LM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

SMALL_COSY_FLOW = CosyFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    up_blocks=1, vocab_size=6561, spk_dim=8, mel_dim=16, est_channels=16,
    est_head_dim=8, est_heads=2, est_n_blocks=1, est_mid_blocks=1,
    n_timesteps=2)
SMALL_STEP_FLOW = StepFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    up_blocks=1, vocab_size=6656, spk_dim=8, mel_dim=16, dit_depth=1,
    dit_hidden=32, dit_heads=2, dit_head_dim=16, n_timesteps=2)
SMALL_GLM_FLOW = GLMFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    vocab_size=16384, spk_dim=8, mel_dim=16, est_channels=(16, 16),
    est_head_dim=8, est_heads=2, est_n_blocks=1, est_mid_blocks=1,
    n_timesteps=2, regulator_layers=1)
SMALL_HIFT = HiFTConfig(in_channels=16, base_channels=32, nb_harmonics=2,
                        upsample_rates=(8, 5, 3), upsample_kernel_sizes=(16, 11, 7),
                        f0_cond_channels=16)


def _small_backbone(vocab, **kw):
    return BackboneConfig(vocab_size=vocab, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128, dtype=jnp.float32, **kw)


def _run_through_worker(model, prompt="hello", steps=30):
    wcfg = WorkerConfig(max_batch_size=2, num_pages=256, page_size=16,
                        prefill_token_buckets=(128, 512), max_prefill_requests=2,
                        warmup=False)
    worker = ModelWorker(model, wcfg)
    req = Request(request_id="r", prompt=prompt)
    worker.run_lm_prefill([req])
    assert req.done_lm_prefill
    for _ in range(steps):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    assert req.num_generated >= 1
    return worker, req


def test_chatterbox_prompt_and_decode():
    m = ChatterboxLM(dtype=jnp.float32,
                     debug_backbone=_small_backbone(6563, llama31_rope_scaling=True),
                     debug_flow=SMALL_COSY_FLOW, debug_hift=SMALL_HIFT)
    po = m.preprocess(prompt="hello there")
    assert po.input_tokens.shape[1] == 1
    assert len(po.input_tokens) > COND_LEN + 2
    assert np.abs(po.input_features[COND_LEN]).sum() > 0  # text row embedded
    assert m.is_stop(np.array([STOP_SPEECH], np.int32))
    worker, req = _run_through_worker(m)
    # detokenize a window if enough audio tokens accumulated
    if len(req.lm_output_audio_tokens) >= 25:
        req.next_audio_decode_idx = [0]
        worker.run_detokenize([req])
        pcm = req.output_audio.get_nowait()
        assert len(pcm) == m.output_audio_length * 2
    worker.free_kv_cache(req)


def test_glm_interleaved_audio_filtering():
    m = GLMVoiceLM(dtype=jnp.float32,
                   debug_backbone=_small_backbone(168960, qkv_bias=True, rope_dim=8),
                   debug_flow=SMALL_GLM_FLOW, debug_hift=SMALL_HIFT)
    req = Request(request_id="g", prompt="x")
    # text token -> not audio
    m.update_request_state(req, np.array([100], np.int32))
    assert len(req.lm_output_audio_tokens) == 0
    # audio token -> audio
    m.update_request_state(req, np.array([GLM_AUDIO_OFFSET + 5], np.int32))
    assert len(req.lm_output_audio_tokens) == 1
    # stop token ends generation without audio
    m.update_request_state(req, np.array([GLM_STOPS[0]], np.int32))
    assert req.done_lm_generation
    assert len(req.lm_output_audio_tokens) == 1


def test_glm_through_worker():
    m = GLMVoiceLM(dtype=jnp.float32,
                   debug_backbone=_small_backbone(168960, qkv_bias=True, rope_dim=8),
                   debug_flow=SMALL_GLM_FLOW, debug_hift=SMALL_HIFT)
    worker, req = _run_through_worker(m, steps=10)
    worker.free_kv_cache(req)


def test_step_audio2_through_worker():
    m = StepAudio2LM(dtype=jnp.float32,
                     debug_backbone=_small_backbone(158720, qkv_bias=True),
                     debug_flow=SMALL_STEP_FLOW, debug_hift=SMALL_HIFT)
    assert m.is_stop(np.array([151643], np.int32))
    req = Request(request_id="s", prompt="x")
    m.update_request_state(req, np.array([STEP_AUDIO_OFFSET + 3], np.int32))
    assert len(req.lm_output_audio_tokens) == 1
    worker, req2 = _run_through_worker(m, steps=10)
    worker.free_kv_cache(req2)
