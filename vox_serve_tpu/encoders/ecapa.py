"""ECAPA-TDNN speaker encoder (Qwen3-TTS Base voice clone), weight-exact.

Faithful JAX re-implementation of the reference Qwen3TTSSpeakerEncoder
(reference model/qwen3_tts.py:835-891) and its blocks (TimeDelayNetBlock,
Res2NetBlock, SqueezeExcitationBlock, AttentiveStatisticsPooling,
SqueezeExcitationRes2NetBlock — reference :317-533), plus the mel front-end
(reference :21-92: n_fft 1024, hop 256, win 1024, slaney mel, log clamp).
``load_ecapa_params`` maps the reference state_dict names; golden parity vs
the torch module is asserted in tests/test_ecapa_parity.py.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.layers import conv1d, init_conv1d


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    mel_dim: int = 80           # 128 for the Base (voice-clone) variant
    enc_dim: int = 2048
    channels: tuple[int, ...] = (512, 512, 512, 512, 1536)
    kernel_sizes: tuple[int, ...] = (5, 3, 3, 3, 1)
    dilations: tuple[int, ...] = (1, 2, 3, 4, 1)
    res2net_scale: int = 8
    se_channels: int = 128
    attention_channels: int = 128


def _reflect_same_conv(p, x, kernel, dilation=1):
    """torch Conv1d(padding="same", padding_mode="reflect") for odd kernels."""
    pad = (kernel - 1) * dilation // 2
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    return conv1d(p, x, padding=0, dilation=dilation)


def _tdnn(p, x, kernel, dilation=1):
    return jax.nn.relu(_reflect_same_conv(p["conv"], x, kernel, dilation))


def _res2net(p, x, scale, kernel, dilation):
    parts = jnp.split(x, scale, axis=1)
    outs = [parts[0]]
    prev = None
    for i in range(1, scale):
        inp = parts[i] if i == 1 else parts[i] + prev
        prev = _tdnn(p["blocks"][i - 1], inp, kernel, dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=1)


def _se_block(p, x):
    m = jnp.mean(x, axis=2, keepdims=True)
    m = jax.nn.relu(conv1d(p["conv1"], m))
    m = jax.nn.sigmoid(conv1d(p["conv2"], m))
    return x * m


def _asp(p, x, attention_kernel=1, eps=1e-12):
    """Attentive statistics pooling -> (B, 2C) (reference :381-468)."""
    B, C, T = x.shape
    mean = jnp.mean(x, axis=2)
    std = jnp.sqrt(jnp.clip(jnp.mean(
        jnp.square(x - mean[:, :, None]), axis=2), eps))
    ctx = jnp.concatenate(
        [x, jnp.repeat(mean[:, :, None], T, 2),
         jnp.repeat(std[:, :, None], T, 2)], axis=1)
    att = _tdnn(p["tdnn"], ctx, attention_kernel)
    att = conv1d(p["conv"], jnp.tanh(att))
    att = jax.nn.softmax(att, axis=2)
    mean = jnp.sum(att * x, axis=2)
    std = jnp.sqrt(jnp.clip(jnp.sum(
        att * jnp.square(x - mean[:, :, None]), axis=2), eps))
    return jnp.concatenate([mean, std], axis=1)


def init_ecapa(cfg: EcapaConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 128))

    def nk():
        return next(keys)

    def tdnn(cin, cout, k):
        return {"conv": init_conv1d(nk(), cin, cout, k)}

    blocks = [tdnn(cfg.mel_dim, cfg.channels[0], cfg.kernel_sizes[0])]
    for i in range(1, len(cfg.channels) - 1):
        cin, cout = cfg.channels[i - 1], cfg.channels[i]
        blocks.append({
            "tdnn1": tdnn(cin, cout, 1),
            "res2net": {"blocks": [
                tdnn(cout // cfg.res2net_scale, cout // cfg.res2net_scale,
                     cfg.kernel_sizes[i])
                for _ in range(cfg.res2net_scale - 1)]},
            "tdnn2": tdnn(cout, cout, 1),
            "se": {"conv1": init_conv1d(nk(), cout, cfg.se_channels, 1),
                   "conv2": init_conv1d(nk(), cfg.se_channels, cout, 1)},
        })
    return {
        "blocks": blocks,
        "mfa": tdnn(cfg.channels[-1], cfg.channels[-1], cfg.kernel_sizes[-1]),
        "asp": {"tdnn": tdnn(cfg.channels[-1] * 3, cfg.attention_channels, 1),
                "conv": init_conv1d(nk(), cfg.attention_channels,
                                    cfg.channels[-1], 1)},
        "fc": init_conv1d(nk(), cfg.channels[-1] * 2, cfg.enc_dim, 1),
    }


def ecapa_embed(params: dict, cfg: EcapaConfig, mel: jax.Array) -> jax.Array:
    """mel (B, T, mel_dim) -> speaker embedding (B, enc_dim). Mirrors the
    reference forward exactly: layer outputs 1..N-1 are concatenated into the
    MFA (multi-layer feature aggregation) input."""
    x = mel.transpose(0, 2, 1)  # (B, mel_dim, T)
    outs = []
    x = _tdnn(params["blocks"][0], x, cfg.kernel_sizes[0], cfg.dilations[0])
    outs.append(x)
    for i, bp in enumerate(params["blocks"][1:], start=1):
        residual = x
        x = _tdnn(bp["tdnn1"], x, 1)
        x = _res2net(bp["res2net"], x, cfg.res2net_scale,
                     cfg.kernel_sizes[i], cfg.dilations[i])
        x = _tdnn(bp["tdnn2"], x, 1)
        x = _se_block(bp["se"], x) + residual
        outs.append(x)
    x = jnp.concatenate(outs[1:], axis=1)
    x = _tdnn(params["mfa"], x, cfg.kernel_sizes[-1], cfg.dilations[-1])
    pooled = _asp(params["asp"], x)                     # (B, 2C)
    emb = conv1d(params["fc"], pooled[:, :, None])      # (B, enc_dim, 1)
    return emb[:, :, 0]


def load_ecapa_params(sd: dict, cfg: EcapaConfig) -> dict:
    """Map the reference Qwen3TTSSpeakerEncoder.state_dict() (checkpoint
    prefix ``speaker_encoder.``) onto the JAX pytree."""
    if any(k.startswith("speaker_encoder.") for k in sd):
        sd = {k[len("speaker_encoder."):]: v for k, v in sd.items()
              if k.startswith("speaker_encoder.")}

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]), jnp.float32)

    def conv(prefix):
        p = {"w": arr(f"{prefix}.weight")}
        if f"{prefix}.bias" in sd:
            p["b"] = arr(f"{prefix}.bias")
        return p

    def tdnn(prefix):
        return {"conv": conv(f"{prefix}.conv")}

    blocks = [tdnn("blocks.0")]
    for i in range(1, len(cfg.channels) - 1):
        pre = f"blocks.{i}"
        blocks.append({
            "tdnn1": tdnn(f"{pre}.tdnn1"),
            "res2net": {"blocks": [
                tdnn(f"{pre}.res2net_block.blocks.{j}")
                for j in range(cfg.res2net_scale - 1)]},
            "tdnn2": tdnn(f"{pre}.tdnn2"),
            "se": {"conv1": conv(f"{pre}.se_block.conv1"),
                   "conv2": conv(f"{pre}.se_block.conv2")},
        })
    return {
        "blocks": blocks,
        "mfa": tdnn("mfa"),
        "asp": {"tdnn": tdnn("asp.tdnn"), "conv": conv("asp.conv")},
        "fc": conv("fc"),
    }


# ---------------------------------------------------------------------------
# mel front-end (reference model/qwen3_tts.py:21-92)
# ---------------------------------------------------------------------------


def slaney_mel_filterbank(sr: int, n_fft: int, n_mels: int,
                          fmin: float = 0.0, fmax: float | None = None
                          ) -> np.ndarray:
    """librosa.filters.mel (slaney scale + slaney norm), numpy."""
    fmax = fmax or sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10)
                                             / min_log_hz) / logstep, mels)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        freqs)

    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sr / 2.0, n_freqs)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                  n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def qwen3_speaker_mel(audio: np.ndarray, n_mels: int,
                      sr: int = 24000) -> np.ndarray:
    """Waveform (S,) float -> (T, n_mels) log-mel, exactly the reference
    front-end (n_fft 1024, hop 256, win 1024, center=False, reflect pad
    (n_fft-hop)//2, slaney mel, log clamp 1e-5)."""
    n_fft, hop, win = 1024, 256, 1024
    pad = (n_fft - hop) // 2
    y = np.pad(audio.astype(np.float32), (pad, pad), mode="reflect")
    window = np.hanning(win + 1)[:-1].astype(np.float32)
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1))          # (T, n_fft/2+1)
    spec = np.sqrt(spec ** 2 + 1e-9)
    fb = slaney_mel_filterbank(sr, n_fft, n_mels, 0.0, 12000.0)
    mel = spec @ fb.T                                    # (T, n_mels)
    return np.log(np.clip(mel, 1e-5, None))
