import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.encoders import (
    MelConfig, SpeakerEncoderConfig, init_speaker_encoder,
    log_mel_spectrogram, speaker_embed,
)


def test_log_mel_shapes():
    cfg = MelConfig(n_mels=16, n_fft=128, hop=64)
    audio = jnp.asarray(np.random.RandomState(0).randn(2, 1600).astype(np.float32))
    mel = log_mel_spectrogram(audio, cfg)
    assert mel.shape == (2, 16, 1600 // 64 + 1)
    assert np.isfinite(np.asarray(mel)).all()


def test_speaker_embedding():
    cfg = SpeakerEncoderConfig(n_mels=16, channels=32, out_dim=24)
    params = init_speaker_encoder(cfg, jax.random.key(2))
    mel = jnp.asarray(np.random.RandomState(0).randn(3, 16, 50).astype(np.float32))
    emb = speaker_embed(params, cfg, mel)
    assert emb.shape == (3, 24)
    # different inputs -> different embeddings
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))
