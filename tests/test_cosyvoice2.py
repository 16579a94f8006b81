"""CosyVoice2 (small dims) + HiFT/flow shape and worker e2e tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.cosyvoice_flow import CosyFlowConfig
from vox_serve_tpu.codecs.hifigan import HiFTConfig, hift_decode, init_hift
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.cosyvoice2 import SOS, STOP_IDS, TASK_ID, CosyVoice2LM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

SMALL_BACKBONE = BackboneConfig(
    vocab_size=151936, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, qkv_bias=True,
    dtype=jnp.float32,
)
SMALL_COSY_FLOW = CosyFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    up_blocks=1, vocab_size=6561, spk_dim=8, mel_dim=16, est_channels=16,
    est_head_dim=8, est_heads=2, est_n_blocks=1, est_mid_blocks=1,
    n_timesteps=2)
SMALL_HIFT = HiFTConfig(in_channels=16, base_channels=32, nb_harmonics=4,
                        upsample_rates=(8, 5, 3), upsample_kernel_sizes=(16, 11, 7),
                        f0_cond_channels=16)


def test_hift_shapes_and_range():
    cfg = SMALL_HIFT
    params = init_hift(cfg, jax.random.key(0))
    mel = jax.random.normal(jax.random.key(1), (2, 16, 10))
    wav, source = hift_decode(params, cfg, mel)
    assert wav.shape == (2, 10 * cfg.total_upsample)
    assert source.shape == (2, 1, 10 * cfg.total_upsample)
    assert np.all(np.abs(np.asarray(wav)) <= cfg.audio_limit + 1e-6)


@pytest.fixture(scope="module")
def model():
    return CosyVoice2LM(dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                        debug_flow=SMALL_COSY_FLOW, debug_hift=SMALL_HIFT)


def test_prompt_structure(model):
    po = model.preprocess(prompt="hello")
    ids = po.input_tokens[:, 0].tolist()
    assert ids[0] == SOS
    assert TASK_ID in ids
    assert po.input_masks.all()  # every prefill row embeds via features
    assert po.input_features.shape == (len(ids), 64)
    # features rows are the host-computed embeddings, not zeros
    assert np.abs(po.input_features).sum() > 0


def test_worker_end_to_end(model):
    wcfg = WorkerConfig(max_batch_size=2, num_pages=512, page_size=16,
                        prefill_token_buckets=(64,), max_prefill_requests=2,
                        warmup=False)
    worker = ModelWorker(model, wcfg)
    req = Request(request_id="cv1", prompt="hello cosy world")
    worker.run_lm_prefill([req])
    assert req.done_lm_prefill
    while len(req.lm_output_audio_tokens) < 28 and not req.done_lm_generation:
        worker.run_lm_decode([req])
    if len(req.lm_output_audio_tokens) >= 28:
        req.next_audio_decode_idx = [0]
        worker.run_detokenize([req])
        pcm = req.output_audio.get_nowait()
        assert len(pcm) == model.output_audio_length * 2
    worker.free_kv_cache(req)


def test_stop_ids(model):
    for sid in STOP_IDS:
        assert model.is_stop(np.array([sid], np.int32))
    assert not model.is_stop(np.array([100], np.int32))
