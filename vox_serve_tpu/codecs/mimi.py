"""Mimi codec (Moshi family) — decode path for CSM-1B.

Compact JAX re-implementation of the reference's MimiModel decode
(tokenizer/mimi.py:2702-3089): split residual VQ (1 semantic + 31 acoustic
codebooks, 2048 bins) -> streaming transformer with ring KV cache
(tokenizer/mimi.py:1213 RingKVCache ~ the same rolling-window attention as
the Qwen3 codec, reused from codecs/qwen3_codec) -> SEANet decoder (ELU +
causal convs, trans-conv upsampling by (8, 6, 5, 4)) -> 24 kHz waveform,
1920 samples per 12.5 Hz frame.

Structure and streaming semantics are complete; checkpoint weight-mapping to
the HF Mimi layout is round-2 work.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .layers import conv1d, conv_transpose1d, init_conv1d, init_conv_transpose1d
from .qwen3_codec import _causal_conv, _causal_transconv, _transformer
from ..models.backbone import _init_linear


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    n_codebooks: int = 32
    codebook_size: int = 2048
    vq_dim: int = 256
    codebook_dim: int = 512
    latent_dim: int = 512
    seanet_dim: int = 512
    upsample_ratios: tuple[int, ...] = (8, 6, 5, 4)
    # transformer (reused from qwen3 codec machinery)
    hidden_size: int = 512
    intermediate_size: int = 2048
    head_dim: int = 64
    num_heads: int = 8
    num_kv_heads: int = 8
    num_layers: int = 8
    sliding_window: int = 250
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    layer_scale_init: float = 0.01
    upsampling_ratios: tuple[int, ...] = ()  # interface compat

    @property
    def samples_per_frame(self) -> int:
        return int(math.prod(self.upsample_ratios))  # 960 @ frame rate 25Hz?

    @property
    def frame_samples(self) -> int:
        return int(math.prod(self.upsample_ratios)) * 2  # upsample x2 first


def init_mimi(cfg: MimiConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 256))

    def nk():
        return next(keys)

    def vq_group(n_q):
        return {
            "embed_sum": jax.random.normal(
                nk(), (n_q, cfg.codebook_size, cfg.vq_dim)) * 0.02,
            "usage": jnp.ones((n_q, cfg.codebook_size)),
            "out_proj": init_conv1d(nk(), cfg.vq_dim, cfg.codebook_dim, 1,
                                    bias=False),
        }

    # transformer params in the qwen3-codec layout so _transformer() applies
    H, hd, KH = cfg.num_heads, cfg.head_dim, cfg.num_kv_heads
    hs = cfg.hidden_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": jnp.ones((hs,)),
            "post_norm": jnp.ones((hs,)),
            "q": _init_linear(nk(), hs, H * hd, jnp.float32),
            "k": _init_linear(nk(), hs, KH * hd, jnp.float32),
            "v": _init_linear(nk(), hs, KH * hd, jnp.float32),
            "o": _init_linear(nk(), H * hd, hs, jnp.float32),
            "gate": _init_linear(nk(), hs, cfg.intermediate_size, jnp.float32),
            "up": _init_linear(nk(), hs, cfg.intermediate_size, jnp.float32),
            "down": _init_linear(nk(), cfg.intermediate_size, hs, jnp.float32),
            "ls_attn": jnp.full((hs,), cfg.layer_scale_init),
            "ls_mlp": jnp.full((hs,), cfg.layer_scale_init),
        })

    # SEANet decoder: init conv, per-ratio [transconv + residual unit], final
    dim = cfg.seanet_dim
    blocks = []
    for i, ratio in enumerate(cfg.upsample_ratios):
        out = dim // (2 ** (i + 1))
        blocks.append({
            "trans": init_conv_transpose1d(nk(), dim // (2 ** i), out,
                                           2 * ratio),
            "res_conv1": init_conv1d(nk(), out, out // 2, 3),
            "res_conv2": init_conv1d(nk(), out // 2, out, 1),
        })
    final_in = dim // (2 ** len(cfg.upsample_ratios))
    return {
        "rvq_first": vq_group(1),
        "rvq_rest": vq_group(cfg.n_codebooks - 1),
        "transformer": {
            "layers": layers,
            "norm": jnp.ones((hs,)),
            "input_proj": _init_linear(nk(), cfg.codebook_dim, hs,
                                       jnp.float32, bias=True),
            "output_proj": _init_linear(nk(), hs, cfg.latent_dim, jnp.float32,
                                        bias=True),
        },
        "upsample_trans": init_conv_transpose1d(nk(), cfg.latent_dim,
                                                cfg.latent_dim, 2),
        "dec_conv0": init_conv1d(nk(), cfg.latent_dim, dim, 7),
        "blocks": blocks,
        "head": init_conv1d(nk(), final_in, 1, 7),
    }


def mimi_init_cache(cfg: MimiConfig, batch: int) -> dict:
    W = cfg.sliding_window
    cache = {
        "pos": jnp.zeros((batch,), jnp.int32),
        "attn_len": jnp.zeros((batch,), jnp.int32),
        "attn_k": jnp.zeros((batch, cfg.num_layers, W, cfg.num_kv_heads,
                             cfg.head_dim)),
        "attn_v": jnp.zeros((batch, cfg.num_layers, W, cfg.num_kv_heads,
                             cfg.head_dim)),
        "up_trans": jnp.zeros((batch, cfg.latent_dim, 1)),
        "dec_conv0": jnp.zeros((batch, cfg.latent_dim, 6)),
        "blocks": [],
        "head": None,
    }
    dim = cfg.seanet_dim
    for i, _ in enumerate(cfg.upsample_ratios):
        out = dim // (2 ** (i + 1))
        cache["blocks"].append({
            "trans": jnp.zeros((batch, dim // (2 ** i), 1)),
            "res": jnp.zeros((batch, out, 2)),
        })
    final_in = dim // (2 ** len(cfg.upsample_ratios))
    cache["head"] = jnp.zeros((batch, final_in, 6))
    return cache


def _rvq_decode(group: dict, codes: jax.Array) -> jax.Array:
    embed = group["embed_sum"] / jnp.clip(group["usage"], 1e-5)[..., None]
    q = jax.vmap(lambda e, c: jnp.take(e, c, axis=0), in_axes=(0, 1),
                 out_axes=1)(embed, codes)
    summed = jnp.sum(q, axis=1)
    return conv1d(group["out_proj"], summed.transpose(0, 2, 1))


def mimi_decode_chunk(params: dict, cfg: MimiConfig, codes: jax.Array,
                      cache: dict | None):
    """codes (B, 32, T) -> (waveform (B, 1, T * 1920), new cache)."""
    own_cache = cache is None
    if own_cache:
        cache = mimi_init_cache(cfg, codes.shape[0])

    z = _rvq_decode(params["rvq_first"], codes[:, :1]) + _rvq_decode(
        params["rvq_rest"], codes[:, 1:])               # (B, 512, T)

    h, tr_cache = _transformer(params, cfg, z.transpose(0, 2, 1), cache)
    h = h.transpose(0, 2, 1)                            # (B, latent, T)

    # x2 upsample (12.5 Hz -> 25 Hz)
    h, up_cache = _causal_transconv(params["upsample_trans"], h, 2, 2,
                                    cache["up_trans"])

    x, c0 = _causal_conv(params["dec_conv0"], h, 6, cache["dec_conv0"])
    new_blocks = []
    for i, (b, ratio) in enumerate(zip(params["blocks"], cfg.upsample_ratios)):
        bc = cache["blocks"][i]
        x = jax.nn.elu(x)
        x, t_cache = _causal_transconv(b["trans"], x, ratio, 2 * ratio,
                                       bc["trans"])
        r = jax.nn.elu(x)
        r, rc = _causal_conv(b["res_conv1"], r, 2, bc["res"])
        r = jax.nn.elu(r)
        r = conv1d(b["res_conv2"], r)
        x = x + r
        new_blocks.append({"trans": t_cache, "res": rc})
    x = jax.nn.elu(x)
    wav, head_cache = _causal_conv(params["head"], x, 6, cache["head"])
    wav = jnp.clip(wav, -1.0, 1.0)

    new_cache = {
        "pos": tr_cache["pos"], "attn_len": tr_cache["attn_len"],
        "attn_k": tr_cache["attn_k"], "attn_v": tr_cache["attn_v"],
        "up_trans": up_cache, "dec_conv0": c0, "blocks": new_blocks,
        "head": head_cache,
    }
    return wav, (None if own_cache else new_cache)
