"""Perth (PerthNet implicit) watermarker, weight-compatible.

Faithful JAX re-implementation of the reference encode/decode path
(watermarker/perth.py:20-540): 32 kHz STFT (hann 2048 / hop 320), log-dB
magnitude normalization against the 1e-9 floor with 15 dB headroom, a
residual conv1d encoder over the <=2 kHz subband (k1 -> 5x k7 -> k1, leaky
ReLU) gated by the loudness mask, and the three-branch (0.75x/1x/1.25x
time-stretch) attention decoder used for detection. The published
``perth_net_250000.pth.tar`` checkpoint (resemble-ai/Perth) maps directly
via ``load_perth_params``, so reference detectors can read our marks.

Serving audio (24 kHz) goes through the same polyphase sinc resample
round-trip the reference applies (perth.py:531-536).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PerthConfig:
    sample_rate: int = 32000
    n_fft: int = 2048
    hop: int = 320
    hidden: int = 256
    max_wmark_freq: float = 2000.0
    stft_magnitude_min: float = 1e-9
    headroom_db: float = 15.0

    @property
    def bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def subband(self) -> int:
        return int(round(self.bins * self.max_wmark_freq
                         / (self.sample_rate / 2)))

    @property
    def min_level_db(self) -> float:
        return 20.0 * math.log10(self.stft_magnitude_min)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------
def _conv_stack_names(prefix: str) -> list[str]:
    return [f"{prefix}.{i}.conv" for i in range(7)]


def load_perth_params(sd: dict, cfg: PerthConfig | None = None) -> dict:
    """Map the PerthNet state dict (checkpoint key ``model``) onto a JAX
    pytree. Conv1d weights keep torch's (out, in, k) layout."""
    def conv(name):
        return {"w": jnp.asarray(np.asarray(sd[name + ".weight"]),
                                 jnp.float32),
                "b": jnp.asarray(np.asarray(sd[name + ".bias"]), jnp.float32)}

    params = {"encoder": [conv(n) for n in
                          _conv_stack_names("encoder.layers")]}
    for branch in ("slow", "normal", "fast"):
        params[f"dec_{branch}"] = [
            conv(n) for n in _conv_stack_names(f"decoder.{branch}_layers")]
    return params


def init_perth_params(key: jax.Array, cfg: PerthConfig) -> dict:
    keys = iter(jax.random.split(key, 64))

    def conv(cin, cout, k):
        return {"w": jax.random.normal(next(keys), (cout, cin, k))
                * (1.0 / math.sqrt(cin * k)),
                "b": jnp.zeros((cout,))}

    def stack(out_ch):
        s, h = cfg.subband, cfg.hidden
        return ([conv(s, h, 1)] + [conv(h, h, 7) for _ in range(5)]
                + [conv(h, out_ch, 1)])

    params = {"encoder": stack(cfg.subband)}
    for branch in ("slow", "normal", "fast"):
        params[f"dec_{branch}"] = stack(2)
    return params


# ---------------------------------------------------------------------------
# audio processor (torchaudio Spectrogram semantics: center, reflect pad,
# periodic hann)
# ---------------------------------------------------------------------------
def perth_stft(cfg: PerthConfig, x: jax.Array):
    """x (B, S) -> (mag_norm, phase) each (B, bins, F)."""
    n, hop = cfg.n_fft, cfg.hop
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (n // 2, n // 2)), mode="reflect")
    F = (xp.shape[1] - n) // hop + 1
    idx = jnp.arange(F)[:, None] * hop + jnp.arange(n)[None, :]
    frames = xp[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)  # (B, F, bins)
    mag = jnp.abs(spec)
    mag = 20.0 * jnp.log10(jnp.clip(mag, min=cfg.stft_magnitude_min))
    mag = (mag - cfg.min_level_db) / (-cfg.min_level_db + cfg.headroom_db)
    phase = jnp.angle(spec)
    return mag.transpose(0, 2, 1), phase.transpose(0, 2, 1)


def perth_istft(cfg: PerthConfig, mag_norm: jax.Array, phase: jax.Array,
                num_samples: int) -> jax.Array:
    n, hop = cfg.n_fft, cfg.hop
    mag_db = mag_norm * (-cfg.min_level_db + cfg.headroom_db) \
        + cfg.min_level_db
    mag = 10.0 ** jnp.clip(mag_db / 20.0, max=10.0)
    comp = (mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)
            ).transpose(0, 2, 1)  # (B, F, bins)
    frames = jnp.fft.irfft(comp, n=n, axis=-1)
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    frames = frames * window[None, None, :]
    B, F, _ = frames.shape
    out_len = n + hop * (F - 1)
    idx = jnp.arange(F)[:, None] * hop + jnp.arange(n)[None, :]
    sig = jnp.zeros((B, out_len)).at[:, idx.reshape(-1)].add(
        frames.reshape(B, -1))
    denom = jnp.zeros((out_len,)).at[idx.reshape(-1)].add(
        jnp.tile(jnp.square(window), (F,)))
    sig = sig / jnp.where(denom > 1e-11, denom, 1.0)[None]
    return sig[:, n // 2:n // 2 + num_samples]


# ---------------------------------------------------------------------------
# network
# ---------------------------------------------------------------------------
def _conv1d(p, x, padding):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), ((padding, padding),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + p["b"][None, :, None]


def _stack(ps, x):
    for i, p in enumerate(ps):
        k = p["w"].shape[-1]
        x = _conv1d(p, x, (k - 1) // 2)
        if i < len(ps) - 1:
            x = jax.nn.leaky_relu(x, 0.01)
    return x


def _magmask(mag, p=0.05):
    s = mag.sum(axis=1)                       # (B, T)
    thresh = s.max(axis=1, keepdims=True) * p
    return (s > thresh).astype(jnp.float32)[:, None]  # (B, 1, T)


def perth_encode_mag(params: dict, cfg: PerthConfig,
                     mag: jax.Array) -> jax.Array:
    """Watermark a normalized magnitude spectrogram (B, bins, T)."""
    mask = _magmask(mag)
    sub = mag[:, :cfg.subband]
    res = _stack(params["encoder"], sub) * mask
    return mag.at[:, :cfg.subband].add(res)


def _lerp(x, size):
    """F.interpolate(mode='linear', align_corners=True) along the last axis."""
    T = x.shape[-1]
    if size == T:
        return x
    pos = jnp.linspace(0.0, T - 1, size)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)
    frac = pos - i0
    return x[..., i0] * (1 - frac) + x[..., i1] * frac


def _nerp(x, size):
    """F.interpolate(mode='nearest') along the last axis."""
    T = x.shape[-1]
    idx = jnp.floor(jnp.arange(size) * (T / size)).astype(jnp.int32)
    return x[..., idx]


def perth_decode_mag(params: dict, cfg: PerthConfig,
                     mag: jax.Array) -> jax.Array:
    """(B, bins, T) -> (B,) watermark confidence (reference Decoder)."""
    mask = _magmask(mag)
    sub = mag[:, :cfg.subband]
    T = sub.shape[-1]

    def branch(name, size):
        x = _lerp(sub, size) if size != T else sub
        out = _stack(params[f"dec_{name}"], x)   # (B, 2, S)
        m = _nerp(mask, out.shape[-1])
        msum = jnp.maximum(m.sum(axis=2), 1e-9)
        attn = (out[:, :1] * m).sum(axis=2) / msum   # (B, 1)
        wm = (out[:, 1:] * m).sum(axis=2) / msum     # (B, 1)
        return attn, wm

    pairs = [branch("slow", int(T * 1.25)), branch("normal", T),
             branch("fast", int(T * 0.75))]
    attn = jnp.concatenate([a for a, _ in pairs], axis=1)  # (B, 3)
    wm = jnp.concatenate([w for _, w in pairs], axis=1)
    attn = jax.nn.softmax(attn, axis=1)
    return (wm * attn).sum(axis=1)


def perth_encode_wav(params: dict, cfg: PerthConfig,
                     audio: jax.Array) -> jax.Array:
    """audio (B, S) at cfg.sample_rate -> watermarked audio, same shape."""
    mag, phase = perth_stft(cfg, audio)
    wm = perth_encode_mag(params, cfg, mag)
    return perth_istft(cfg, wm, phase, audio.shape[1])


def perth_get_watermark(params: dict, cfg: PerthConfig,
                        audio: jax.Array) -> jax.Array:
    mag, _ = perth_stft(cfg, audio)
    return jnp.clip(perth_decode_mag(params, cfg, mag), 0.0, 1.0)
