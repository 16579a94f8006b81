"""S3 speech tokenizer: reference audio -> discrete speech tokens (FSQ).

TPU-native analogue of the reference's shared S3 tokenizer family
(tokenizer/s3.py:330-623: ``AudioEncoderV2`` conv+transformer mel encoder,
``FSQVectorQuantization`` finite-scalar quantizer) used by CosyVoice2
(model/cosyvoice2.py:360-373) and Chatterbox for voice-cloning prompts, and
its ONNX-Runtime deployment path. Runs as one jitted function at preprocess
time (prefill-side, not per-step latency critical).

Finite Scalar Quantization: project features to a small number of dims,
bound each to ``levels`` integer cells, and read the mixed-radix code as the
token id — no codebook lookup, no nearest-neighbour search, fully
XLA-friendly (round + dot with radix weights).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..models.backbone import _init_linear, linear
from ..ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    hidden: int = 1280
    layers: int = 6
    heads: int = 20
    fsq_dims: int = 8
    fsq_levels: int = 3  # 3^8 = 6561 token space (reference S3 convention)
    max_frames: int = 3000

    @property
    def vocab_size(self) -> int:
        return self.fsq_levels ** self.fsq_dims


def init_s3_tokenizer(cfg: S3TokenizerConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.layers))

    def nk():
        return next(keys)

    p = {
        "conv1_w": jax.random.normal(nk(), (cfg.hidden, cfg.n_mels, 3)) * 0.02,
        "conv1_b": jnp.zeros((cfg.hidden,)),
        "conv2_w": jax.random.normal(nk(), (cfg.hidden, cfg.hidden, 3)) * 0.02,
        "conv2_b": jnp.zeros((cfg.hidden,)),
        "pos": jax.random.normal(nk(), (cfg.max_frames, cfg.hidden)) * 0.01,
        "layers": [],
        "norm_w": jnp.ones((cfg.hidden,)), "norm_b": jnp.zeros((cfg.hidden,)),
        "fsq_in": _init_linear(nk(), cfg.hidden, cfg.fsq_dims, jnp.float32,
                               bias=True),
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "n1w": jnp.ones((cfg.hidden,)), "n1b": jnp.zeros((cfg.hidden,)),
            "qkv": _init_linear(nk(), cfg.hidden, 3 * cfg.hidden,
                                jnp.float32, bias=True),
            "o": _init_linear(nk(), cfg.hidden, cfg.hidden, jnp.float32,
                              bias=True),
            "n2w": jnp.ones((cfg.hidden,)), "n2b": jnp.zeros((cfg.hidden,)),
            "ff1": _init_linear(nk(), cfg.hidden, 4 * cfg.hidden,
                                jnp.float32, bias=True),
            "ff2": _init_linear(nk(), 4 * cfg.hidden, cfg.hidden,
                                jnp.float32, bias=True),
        })
    return p


def fsq_quantize(cfg: S3TokenizerConfig, z: jax.Array) -> jax.Array:
    """FSQ: (..., fsq_dims) float -> (...,) int32 token ids.

    Each dim is squashed to [-(L-1)/2, (L-1)/2], rounded to the integer
    lattice, shifted to [0, L), and combined as a mixed-radix number.
    """
    half = (cfg.fsq_levels - 1) / 2.0
    cells = jnp.round(jnp.tanh(z) * half) + half  # [0, L)
    radix = cfg.fsq_levels ** jnp.arange(cfg.fsq_dims, dtype=jnp.float32)
    return jnp.sum(cells * radix, axis=-1).astype(jnp.int32)


def s3_tokenize(params: dict, cfg: S3TokenizerConfig,
                mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, T) -> speech tokens (B, T//2) int32.

    Conv stem downsamples x2 (50 Hz mel -> 25 Hz tokens, the reference's
    S3 v2 rate); bidirectional transformer; FSQ head.
    """
    x = jax.lax.conv_general_dilated(
        mel, params["conv1_w"], (1,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = jax.nn.gelu(x + params["conv1_b"][None, :, None])
    x = jax.lax.conv_general_dilated(
        x, params["conv2_w"], (2,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = jax.nn.gelu(x + params["conv2_b"][None, :, None])
    x = x.transpose(0, 2, 1)  # (B, T', H)
    B, T, H = x.shape
    x = x + params["pos"][:T][None]

    hd = cfg.hidden // cfg.heads
    for lp in params["layers"]:
        h = layer_norm(x, lp["n1w"], lp["n1b"])
        qkv = linear(lp["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, cfg.heads, hd)
        k = k.reshape(B, T, cfg.heads, hd)
        v = v.reshape(B, T, cfg.heads, hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
        a = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, -1), v)
        x = x + linear(lp["o"], a.reshape(B, T, -1))
        h2 = layer_norm(x, lp["n2w"], lp["n2b"])
        x = x + linear(lp["ff2"], jax.nn.gelu(linear(lp["ff1"], h2)))
    x = layer_norm(x, params["norm_w"], params["norm_b"])
    return fsq_quantize(cfg, linear(params["fsq_in"], x))
