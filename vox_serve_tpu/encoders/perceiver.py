"""Perceiver resampler: variable-length prompt features -> fixed cond slots.

TPU-native analogue of the reference's Chatterbox conditioning encoder
(encoder/chatterbox.py:209-311: ``ChatterboxPerceiver`` cross-attention
resampler + ``ChatterboxCondEnc``/``T3Cond`` packing of speaker embedding,
32 resampled prompt-speech vectors, and an emotion scalar). A fixed set of
learned latent queries cross-attends over the (padded, masked) prompt
features, so the output shape is static regardless of prompt length —
exactly what bucketed jit prefill needs.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..models.backbone import _init_linear, linear
from ..ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    in_dim: int = 1024
    hidden: int = 1024
    heads: int = 16
    layers: int = 2
    n_latents: int = 32  # resampled conditioning slots (chatterbox.py:38)
    max_prompt: int = 300


def init_perceiver(cfg: PerceiverConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 4 + 8 * cfg.layers))

    def nk():
        return next(keys)

    p = {
        "latents": jax.random.normal(nk(), (cfg.n_latents, cfg.hidden)) * 0.02,
        "in_proj": _init_linear(nk(), cfg.in_dim, cfg.hidden, jnp.float32,
                                bias=True),
        "layers": [],
        "norm_w": jnp.ones((cfg.hidden,)), "norm_b": jnp.zeros((cfg.hidden,)),
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "nq_w": jnp.ones((cfg.hidden,)), "nq_b": jnp.zeros((cfg.hidden,)),
            "nk_w": jnp.ones((cfg.hidden,)), "nk_b": jnp.zeros((cfg.hidden,)),
            "q": _init_linear(nk(), cfg.hidden, cfg.hidden, jnp.float32,
                              bias=True),
            "kv": _init_linear(nk(), cfg.hidden, 2 * cfg.hidden, jnp.float32,
                               bias=True),
            "o": _init_linear(nk(), cfg.hidden, cfg.hidden, jnp.float32,
                              bias=True),
            "nf_w": jnp.ones((cfg.hidden,)), "nf_b": jnp.zeros((cfg.hidden,)),
            "ff1": _init_linear(nk(), cfg.hidden, 4 * cfg.hidden, jnp.float32,
                                bias=True),
            "ff2": _init_linear(nk(), 4 * cfg.hidden, cfg.hidden, jnp.float32,
                                bias=True),
        })
    return p


def perceiver_resample(params: dict, cfg: PerceiverConfig,
                       feats: jax.Array,
                       mask: jax.Array | None = None) -> jax.Array:
    """feats (B, T, in_dim), mask (B, T) bool -> latents (B, n_latents, H).

    Latents attend over both the prompt features and the latents themselves
    (concatenated KV, the perceiver-resampler convention), masked so padded
    prompt positions are ignored.
    """
    B, T, _ = feats.shape
    x = linear(params["in_proj"], feats)
    lat = jnp.broadcast_to(params["latents"][None], (B, cfg.n_latents,
                                                     cfg.hidden))
    hd = cfg.hidden // cfg.heads
    if mask is None:
        mask = jnp.ones((B, T), bool)
    kv_mask = jnp.concatenate(
        [mask, jnp.ones((B, cfg.n_latents), bool)], axis=1)

    for lp in params["layers"]:
        q_in = layer_norm(lat, lp["nq_w"], lp["nq_b"])
        kv_in = layer_norm(jnp.concatenate([x, lat], axis=1),
                           lp["nk_w"], lp["nk_b"])
        q = linear(lp["q"], q_in).reshape(B, cfg.n_latents, cfg.heads, hd)
        kv = linear(lp["kv"], kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        S = T + cfg.n_latents
        k = k.reshape(B, S, cfg.heads, hd)
        v = v.reshape(B, S, cfg.heads, hd)
        s = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(hd)
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
        a = jnp.einsum("bhls,bshd->blhd", jax.nn.softmax(s, -1), v)
        lat = lat + linear(lp["o"], a.reshape(B, cfg.n_latents, -1))
        h = layer_norm(lat, lp["nf_w"], lp["nf_b"])
        lat = lat + linear(lp["ff2"], jax.nn.gelu(linear(lp["ff1"], h)))
    return layer_norm(lat, params["norm_w"], params["norm_b"])
