"""Whisper-style audio encoder (mel -> hidden states / discrete tokens).

Covers the reference's two audio-input encoders:
  * GLM Whisper-VQ (encoder/glm.py:217-369): 30 s windows, conv stem +
    transformer, vector-quantized to discrete speech tokens
  * Step-Audio-2 encoder (encoder/step_audio_2.py:197-225): conv stem +
    transformer, 25 Hz -> 12.5 Hz pooled features for the LM adaptor

Structure is complete and jit-compatible; checkpoint weight mapping lands
with real assets.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import _init_linear, linear
from ..ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    hidden: int = 512
    layers: int = 4
    heads: int = 8
    max_frames: int = 3000
    vq_codebook: int | None = 16384  # GLM Whisper-VQ; None = features out
    pool: int = 1  # Step: 2 (25 Hz -> 12.5 Hz)


def init_whisper_encoder(cfg: WhisperEncoderConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 64))

    def nk():
        return next(keys)

    p = {
        "conv1_w": jax.random.normal(nk(), (cfg.hidden, cfg.n_mels, 3)) * 0.05,
        "conv1_b": jnp.zeros((cfg.hidden,)),
        "conv2_w": jax.random.normal(nk(), (cfg.hidden, cfg.hidden, 3)) * 0.05,
        "conv2_b": jnp.zeros((cfg.hidden,)),
        "pos": jax.random.normal(nk(), (cfg.max_frames, cfg.hidden)) * 0.02,
        "layers": [],
        "norm_w": jnp.ones((cfg.hidden,)), "norm_b": jnp.zeros((cfg.hidden,)),
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "n1w": jnp.ones((cfg.hidden,)), "n1b": jnp.zeros((cfg.hidden,)),
            "qkv": _init_linear(nk(), cfg.hidden, 3 * cfg.hidden, jnp.float32,
                                bias=True),
            "o": _init_linear(nk(), cfg.hidden, cfg.hidden, jnp.float32,
                              bias=True),
            "n2w": jnp.ones((cfg.hidden,)), "n2b": jnp.zeros((cfg.hidden,)),
            "ff1": _init_linear(nk(), cfg.hidden, 4 * cfg.hidden, jnp.float32,
                                bias=True),
            "ff2": _init_linear(nk(), 4 * cfg.hidden, cfg.hidden, jnp.float32,
                                bias=True),
        })
    if cfg.vq_codebook:
        p["vq"] = jax.random.normal(nk(), (cfg.vq_codebook, cfg.hidden)) * 0.02
    return p


def whisper_encode(params: dict, cfg: WhisperEncoderConfig,
                   mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, T) -> tokens (B, T') int32 if vq_codebook else
    features (B, T', hidden). Conv stem downsamples x2 like Whisper."""
    x = jax.lax.conv_general_dilated(
        mel, params["conv1_w"], (1,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH")) + params["conv1_b"][None, :, None]
    x = jax.nn.gelu(x)
    x = jax.lax.conv_general_dilated(
        x, params["conv2_w"], (2,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH")) + params["conv2_b"][None, :, None]
    x = jax.nn.gelu(x)
    x = x.transpose(0, 2, 1)  # (B, T', H)
    T = x.shape[1]
    x = x + params["pos"][:T][None]

    B = x.shape[0]
    heads = cfg.heads
    hd = cfg.hidden // heads
    for lp in params["layers"]:
        h = layer_norm(x, lp["n1w"], lp["n1b"])
        qkv = linear(lp["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, heads, hd)
        k = k.reshape(B, T, heads, hd)
        v = v.reshape(B, T, heads, hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
        a = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, -1), v)
        x = x + linear(lp["o"], a.reshape(B, T, -1))
        h2 = layer_norm(x, lp["n2w"], lp["n2b"])
        x = x + linear(lp["ff2"], jax.nn.gelu(linear(lp["ff1"], h2)))
    x = layer_norm(x, params["norm_w"], params["norm_b"])

    if cfg.pool > 1:
        T2 = (T // cfg.pool) * cfg.pool
        x = x[:, :T2].reshape(B, T2 // cfg.pool, cfg.pool, -1).mean(axis=2)
    if cfg.vq_codebook:
        # nearest-codebook quantization (Whisper-VQ token output)
        d = (jnp.sum(x * x, -1, keepdims=True)
             - 2 * x @ params["vq"].T
             + jnp.sum(params["vq"] ** 2, -1)[None, None])
        return jnp.argmin(d, axis=-1).astype(jnp.int32)
    return x
