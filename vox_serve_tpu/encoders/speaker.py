"""Speaker embedding encoders (x-vectors).

Covers the reference's speaker nets: ECAPA-style TDNN with attentive
statistics pooling (Qwen3-TTS base voice-clone, qwen3_tts.py:835-891;
CosyVoice2/Chatterbox CAMPPlus; Zonos ResNet/ECAPA + LDA,
encoder/zonos.py:200-411). One compact TDNN + ASP implementation with a
configurable output dim serves all call sites; per-family checkpoint mapping
lands with real assets.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..codecs.layers import conv1d, init_conv1d
from ..models.backbone import _init_linear, linear


@dataclasses.dataclass(frozen=True)
class SpeakerEncoderConfig:
    n_mels: int = 80
    channels: int = 512
    layers: int = 3
    out_dim: int = 192  # x-vector dim (CAMPPlus/ECAPA convention)


def init_speaker_encoder(cfg: SpeakerEncoderConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 32))

    def nk():
        return next(keys)

    p = {"blocks": []}
    in_ch = cfg.n_mels
    for _ in range(cfg.layers):
        p["blocks"].append({
            "conv": init_conv1d(nk(), in_ch, cfg.channels, 3),
        })
        in_ch = cfg.channels
    # attentive statistics pooling
    p["asp_w"] = init_conv1d(nk(), cfg.channels, 128, 1)
    p["asp_v"] = init_conv1d(nk(), 128, cfg.channels, 1)
    p["out"] = _init_linear(nk(), 2 * cfg.channels, cfg.out_dim, jnp.float32,
                            bias=True)
    return p


def speaker_embed(params: dict, cfg: SpeakerEncoderConfig,
                  mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, T) -> x-vector (B, out_dim)."""
    x = mel
    # TDNN dilation schedule 1,2,3,... is static (shape-affecting), so it
    # lives here rather than in the param pytree (jit-traceable leaves only)
    for i, b in enumerate(params["blocks"]):
        dil = i + 1
        x = jax.nn.relu(conv1d(b["conv"], x, padding=dil, dilation=dil))
    # attentive statistics pooling
    att = jnp.tanh(conv1d(params["asp_w"], x))
    att = jax.nn.softmax(conv1d(params["asp_v"], att), axis=-1)  # (B, C, T)
    mean = jnp.sum(x * att, axis=-1)
    var = jnp.sum((x ** 2) * att, axis=-1) - mean ** 2
    std = jnp.sqrt(jnp.clip(var, min=1e-6))
    stats = jnp.concatenate([mean, std], axis=-1)
    return linear(params["out"], stats)
