"""Log-mel spectrogram frontend (host/JAX) shared by the audio-input
encoders (GLM Whisper-VQ, Step-Audio-2 encoder, speaker embedders)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 400
    hop: int = 160
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filterbank (Slaney-style shapes)."""
    fmax = cfg.fmax or cfg.sample_rate / 2
    n_bins = cfg.n_fft // 2 + 1
    freqs = np.linspace(0, cfg.sample_rate / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel(cfg.fmin), _hz_to_mel(fmax),
                          cfg.n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((cfg.n_mels, n_bins), np.float32)
    for i in range(cfg.n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


def log_mel_spectrogram(audio: jax.Array, cfg: MelConfig) -> jax.Array:
    """audio (B, T) -> log-mel (B, n_mels, frames), Whisper-style dynamic
    range compression."""
    n, hop = cfg.n_fft, cfg.hop
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    pad = n // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (x.shape[1] - n) // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n)[None, :]
    frames = x[:, idx] * window[None, None, :]
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2   # (B, F, bins)
    fb = jnp.asarray(mel_filterbank(cfg))
    mel = jnp.einsum("mf,btf->bmt", fb, spec)
    logmel = jnp.log10(jnp.clip(mel, min=1e-10))
    logmel = jnp.maximum(logmel, jnp.max(logmel, axis=(1, 2),
                                         keepdims=True) - 8.0)
    return (logmel + 4.0) / 4.0
