import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.encoders import (
    MelConfig, SpeakerEncoderConfig, WhisperEncoderConfig,
    init_speaker_encoder, init_whisper_encoder, log_mel_spectrogram,
    speaker_embed, whisper_encode,
)

SMALL_WHISPER = WhisperEncoderConfig(n_mels=16, hidden=32, layers=1, heads=4,
                                     max_frames=512, vq_codebook=64, pool=1)


def test_log_mel_shapes():
    cfg = MelConfig(n_mels=16, n_fft=128, hop=64)
    audio = jnp.asarray(np.random.RandomState(0).randn(2, 1600).astype(np.float32))
    mel = log_mel_spectrogram(audio, cfg)
    assert mel.shape == (2, 16, 1600 // 64 + 1)
    assert np.isfinite(np.asarray(mel)).all()


def test_whisper_encoder_tokens():
    params = init_whisper_encoder(SMALL_WHISPER, jax.random.key(0))
    mel = jnp.zeros((1, 16, 64))
    toks = whisper_encode(params, SMALL_WHISPER, mel)
    assert toks.shape == (1, 32)  # conv stem downsamples x2
    assert toks.dtype == jnp.int32
    assert np.all(np.asarray(toks) < 64)


def test_whisper_encoder_features_with_pool():
    cfg = WhisperEncoderConfig(n_mels=16, hidden=32, layers=1, heads=4,
                               max_frames=512, vq_codebook=None, pool=2)
    params = init_whisper_encoder(cfg, jax.random.key(1))
    mel = jnp.zeros((1, 16, 64))
    feats = whisper_encode(params, cfg, mel)
    assert feats.shape == (1, 16, 32)  # /2 conv, /2 pool


def test_speaker_embedding():
    cfg = SpeakerEncoderConfig(n_mels=16, channels=32, out_dim=24)
    params = init_speaker_encoder(cfg, jax.random.key(2))
    mel = jnp.asarray(np.random.RandomState(0).randn(3, 16, 50).astype(np.float32))
    emb = speaker_embed(params, cfg, mel)
    assert emb.shape == (3, 24)
    # different inputs -> different embeddings
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))
