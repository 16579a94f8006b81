"""Orpheus (small dims) through the full worker path, plus SNAC shape checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.snac import SNACConfig, init_snac_decoder, snac_decode
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.orpheus import (
    PROMPT_END, PROMPT_START, STOP_TOKEN, OrpheusLM,
)
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

SMALL_BACKBONE = BackboneConfig(
    vocab_size=156940, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128,
    rope_theta=500000.0, llama31_rope_scaling=True, dtype=jnp.float32,
)
SMALL_SNAC = SNACConfig(decoder_dim=64, decoder_rates=(8, 8, 4, 2),
                        latent_dim=32, codebook_size=4096, codebook_dim=8,
                        vq_strides=(4, 2, 1), depthwise=True)


@pytest.fixture(scope="module")
def model():
    return OrpheusLM(dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                     debug_codec=SMALL_SNAC)


def test_snac_decode_shapes():
    cfg = SMALL_SNAC
    params = init_snac_decoder(cfg, jax.random.key(0))
    codes = [jnp.zeros((2, 4), jnp.int32), jnp.zeros((2, 8), jnp.int32),
             jnp.zeros((2, 16), jnp.int32)]
    audio = snac_decode(params, cfg, codes)
    assert audio.shape == (2, 1, 16 * cfg.hop_per_latent)
    assert np.all(np.abs(np.asarray(audio)) <= 1.0)


def test_prompt_construction(model):
    po = model.preprocess(prompt="hello world", voice="tara")
    ids = po.input_tokens[:, 0].tolist()
    assert ids[0] == PROMPT_START
    assert ids[-4:] == PROMPT_END
    assert po.input_tokens.shape[1] == 1
    with pytest.raises(ValueError):
        model.preprocess(prompt="x", voice="nonexistent")


def test_token_regroup_matches_reference_formula(model):
    """detokenize must regroup (28,) windows exactly like orpheus.py:479-494."""
    rng = np.random.RandomState(0)
    window = rng.randint(128266, 128266 + 4096, size=(1, 28, 1)).astype(np.int32)
    mf = ((window[:, :, 0].reshape(1, 4, 7)) - 128256 - 10) % 4096
    ref_c0 = mf[:, :, 0]
    ref_c1 = mf[:, :, [1, 4]].reshape(1, 8)
    ref_c2 = mf[:, :, [2, 3, 5, 6]].reshape(1, 16)

    # run detokenize and separately the same regroup via the codec to assert
    # audio depends only on the regrouped codes
    audio1, _ = model.detokenize(model.codec_params, jnp.asarray(window), None)
    audio2 = snac_decode(model.codec_params, model._snac_cfg,
                         [jnp.asarray(ref_c0), jnp.asarray(ref_c1),
                          jnp.asarray(ref_c2)])
    lo = model._decoded_window_samples // 4
    np.testing.assert_allclose(np.asarray(audio1), np.asarray(audio2[:, :, lo:2 * lo]),
                               rtol=1e-5, atol=1e-5)
    assert audio1.shape == (1, 1, model.output_audio_length)


def test_orpheus_through_worker_end_to_end(model):
    wcfg = WorkerConfig(max_batch_size=2, num_pages=128, page_size=16,
                        prefill_token_buckets=(64,), max_prefill_requests=2,
                        warmup=False)
    worker = ModelWorker(model, wcfg)
    req = Request(request_id="orph1", prompt="hi there friend")
    worker.run_lm_prefill([req])
    assert req.done_lm_prefill
    # force audio-range tokens so detokenize gets valid SNAC codes
    for _ in range(30):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    # override with in-range audio tokens (random weights sample arbitrary ids)
    req.lm_output_audio_tokens = [
        np.array([128266 + (i * 37) % 4096], np.int32) for i in range(28)
    ]
    req.next_audio_decode_idx = [0]
    worker.run_detokenize([req])
    pcm = req.output_audio.get_nowait()
    assert len(pcm) == model.output_audio_length * 2
    worker.free_kv_cache(req)


def test_stop_token_semantics(model):
    req = Request(request_id="s", prompt="x")
    req.sampling_config = model.sampling_config
    model.update_request_state(req, np.array([STOP_TOKEN], np.int32))
    assert req.done_lm_generation
    assert len(req.lm_output_audio_tokens) == 0  # stop token not in audio
