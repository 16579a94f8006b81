"""Zonos: delay-pattern semantics through the jitted step + DAC decode."""

import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.snac import SNACConfig
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.zonos import EOS_TOKEN, MASKED_TOKEN, N_CB, ZonosLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

SMALL_BACKBONE = BackboneConfig(
    vocab_size=1025, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=4, head_dim=16, intermediate_size=128, use_layer_norm=True,
    dtype=jnp.float32,
)
SMALL_DAC = SNACConfig(
    sampling_rate=44100, decoder_dim=64, decoder_rates=(4, 2),
    latent_dim=32, codebook_size=1024, codebook_dim=8,
    vq_strides=(1,) * 9, noise=False, depthwise=False,
)


@pytest.fixture(scope="module")
def model():
    return ZonosLM(dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                   debug_codec=SMALL_DAC)


def test_eos_bias_only_cb0(model):
    logits = jnp.zeros((1, N_CB, 1025))
    adj = np.asarray(model.adjust_logits(logits))
    assert adj[0, 0, EOS_TOKEN] == 0.0
    assert np.all(adj[0, 1:, EOS_TOKEN] < -1e30)


def test_delay_pattern_masks_first_steps(model):
    wcfg = WorkerConfig(max_batch_size=2, num_pages=192, page_size=16,
                        prefill_token_buckets=(64,), max_prefill_requests=2,
                        warmup=False)
    worker = ModelWorker(model, wcfg)
    req = Request(request_id="z1", prompt="hello zonos")
    worker.run_lm_prefill([req])
    # output 0: codebooks 1..8 must be masked
    row0 = req.lm_output_tokens[0]
    assert np.all(row0[1:] == MASKED_TOKEN)
    worker.run_lm_decode([req])
    row1 = req.lm_output_tokens[1]
    assert np.all(row1[2:] == MASKED_TOKEN)
    assert row1[1] != MASKED_TOKEN or row1[1] <= 1024  # cb1 now live
    for _ in range(10):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    if not req.done_lm_generation:
        row10 = req.lm_output_tokens[-1]
        assert np.all(row10 <= 1025)
    worker.free_kv_cache(req)


def test_delay_revert_in_detokenize(model):
    # build a window where token[t, k] = encoding of (t - k) so the revert
    # must produce codes[k][t] == t for all k
    T = model.detokenize_interval
    window = np.zeros((1, T, N_CB), np.int32)
    for t in range(T):
        for k in range(N_CB):
            window[0, t, k] = max(t - k, 0) % 1024
    audio, _ = model.detokenize(model.codec_params, jnp.asarray(window), None)
    frames = T - N_CB
    n44 = frames * SMALL_DAC.hop_per_latent
    # ceil output-length convention (torchaudio resample semantics)
    assert audio.shape == (1, 1, -(-n44 * 80 // 147))


def test_prefix_conditioning_prompt(model):
    po = model.preprocess(prompt="abc")
    # faithful prefix stack: [BOS, a, b, c, EOS] espeak rows + speaker +
    # emotion + fmax + pitch_std + speaking_rate + language_id
    assert po.input_tokens.shape == (11, N_CB)
    assert (po.input_tokens == MASKED_TOKEN).all()
    assert po.input_masks.all()
    assert np.abs(po.input_features).sum() > 0
    # longer prompt -> more espeak rows only
    po2 = model.preprocess(prompt="abcdef")
    assert po2.input_tokens.shape == (14, N_CB)


def test_sinc_resample_antialias_and_passband():
    """The 44.1k->24k output resampler must be windowed-sinc (reference
    torchaudio semantics, /root/reference/vox_serve/model/zonos.py:929-935),
    not linear interpolation: a tone above the 12 kHz output Nyquist must be
    attenuated, and a passband tone must match scipy's polyphase resampler."""
    import scipy.signal
    from vox_serve_tpu.models.zonos import _resample_441_to_24

    sr = 44100
    t = np.arange(sr) / sr  # 1 s
    # passband: 1 kHz tone
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None, None]
    y = np.asarray(_resample_441_to_24(jnp.asarray(x)))[0, 0]
    ref = scipy.signal.resample_poly(x[0, 0], 80, 147)
    n = min(len(y), len(ref))
    # trim filter edges; compare mid-section
    m = slice(1000, n - 1000)
    err = np.sqrt(np.mean((y[m] - ref[m]) ** 2))
    assert err < 0.01, err  # > 40 dB agreement with scipy polyphase

    # stopband: 20 kHz tone (above output Nyquist) must nearly vanish
    x_hi = np.sin(2 * np.pi * 20000 * t).astype(np.float32)[None, None]
    y_hi = np.asarray(_resample_441_to_24(jnp.asarray(x_hi)))[0, 0]
    rms = np.sqrt(np.mean(y_hi[m] ** 2))
    assert rms < 0.02, rms  # linear interp leaves ~0.2+ aliased energy
