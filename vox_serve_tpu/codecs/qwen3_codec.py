"""Qwen3-TTS-Tokenizer-12Hz decoder (JAX, streaming-first).

Faithful re-implementation of the reference decode path
(tokenizer/qwen3_codec.py:1307-1903): split residual VQ (1 semantic + 15
acoustic quantizers, EuclideanCodebook embedding = embedding_sum /
cluster_usage) -> causal pre-conv -> 8-layer sliding-window (72-token)
transformer with LayerScale -> 2x ConvNeXt upsampling stages (x2 each) ->
causal transposed-conv decoder (rates 8,5,4,3 with SnakeBeta + dilated
residual units) -> waveform at 24 kHz, 1920 samples per 12.5 Hz frame.

Streaming state is a functional pytree (per-slot batched by the worker):
causal convs carry their left context, trans-convs their last input sample,
and attention a rolling 72-token KV window. ``decode_chunk`` over consecutive
chunks produces bit-identical audio to a full ``decode`` — asserted in
tests/test_qwen3_codec.py, which is the correctness oracle for every cache.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm, rms_norm
from ..ops.pallas_resunit import (
    default_interpret, fused_resunit_stack, use_fused_resunit,
)
from ..ops.rope import rope_frequencies
from .layers import (
    conv1d, conv1d_nhc, conv_transpose1d, conv_transpose1d_nhc,
    init_conv1d, init_conv_transpose1d,
)
from ..models.backbone import _init_linear, linear

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class Qwen3CodecConfig:
    codebook_dim: int = 512
    codebook_size: int = 2048
    latent_dim: int = 1024
    decoder_dim: int = 1536
    hidden_size: int = 512
    intermediate_size: int = 1024
    head_dim: int = 64
    num_heads: int = 16
    num_kv_heads: int = 16
    num_layers: int = 8
    num_quantizers: int = 16
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 72
    upsample_rates: tuple[int, ...] = (8, 5, 4, 3)
    upsampling_ratios: tuple[int, ...] = (2, 2)
    layer_scale_init: float = 0.01
    vq_dim: int = 256  # codebook_dim // 2

    @property
    def samples_per_frame(self) -> int:
        return int(math.prod(self.upsample_rates)
                   * math.prod(self.upsampling_ratios))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_qwen3_codec(cfg: Qwen3CodecConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 512))

    def nk():
        return next(keys)

    def vq_group(n_q):
        return {
            # EuclideanCodebook stores (embedding_sum, cluster_usage)
            "embed_sum": jax.random.normal(
                nk(), (n_q, cfg.codebook_size, cfg.vq_dim)) * 0.02,
            "usage": jnp.ones((n_q, cfg.codebook_size)),
            "out_proj": init_conv1d(nk(), cfg.vq_dim, cfg.codebook_dim, 1,
                                    bias=False),
        }

    params: dict = {
        "rvq_first": vq_group(1),
        "rvq_rest": vq_group(cfg.num_quantizers - 1),
        "pre_conv": init_conv1d(nk(), cfg.codebook_dim, cfg.latent_dim, 3),
    }

    # transformer
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
    params["transformer"] = {
        "layers": layers,
        "norm": jnp.ones((hs,)),
        "input_proj": _init_linear(nk(), cfg.latent_dim, hs, jnp.float32,
                                   bias=True),
        "output_proj": _init_linear(nk(), hs, cfg.latent_dim, jnp.float32,
                                    bias=True),
    }

    # upsample stages (transconv + ConvNeXt)
    ups = []
    for factor in cfg.upsampling_ratios:
        ups.append({
            "trans": init_conv_transpose1d(nk(), cfg.latent_dim,
                                           cfg.latent_dim, factor),
            "convnext": {
                "dw": init_conv1d(nk(), cfg.latent_dim, cfg.latent_dim, 7,
                                  groups=cfg.latent_dim),
                "norm_w": jnp.ones((cfg.latent_dim,)),
                "norm_b": jnp.zeros((cfg.latent_dim,)),
                "pw1": _init_linear(nk(), cfg.latent_dim, 4 * cfg.latent_dim,
                                    jnp.float32, bias=True),
                "pw2": _init_linear(nk(), 4 * cfg.latent_dim, cfg.latent_dim,
                                    jnp.float32, bias=True),
                "gamma": jnp.full((cfg.latent_dim,), 1e-6),
            },
        })
    params["upsample"] = ups

    # decoder
    dec: dict = {"conv0": init_conv1d(nk(), cfg.latent_dim, cfg.decoder_dim, 7)}
    blocks = []
    for i, rate in enumerate(cfg.upsample_rates):
        in_dim = cfg.decoder_dim // (2 ** i)
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        res = []
        for dil in (1, 3, 9):
            res.append({
                "alpha1": jnp.zeros((out_dim,)),
                "beta1": jnp.zeros((out_dim,)),
                "conv1": init_conv1d(nk(), out_dim, out_dim, 7),
                "alpha2": jnp.zeros((out_dim,)),
                "beta2": jnp.zeros((out_dim,)),
                "conv2": init_conv1d(nk(), out_dim, out_dim, 1),
            })
        blocks.append({
            "alpha": jnp.zeros((in_dim,)),
            "beta": jnp.zeros((in_dim,)),
            "trans": init_conv_transpose1d(nk(), in_dim, out_dim, 2 * rate),
            "res": res,
        })
    dec["blocks"] = blocks
    out_dim = cfg.decoder_dim // (2 ** len(cfg.upsample_rates))
    dec["alpha_out"] = jnp.zeros((out_dim,))
    dec["beta_out"] = jnp.zeros((out_dim,))
    dec["head"] = init_conv1d(nk(), out_dim, 1, 7)
    params["decoder"] = dec
    return params


# ---------------------------------------------------------------------------
# streaming cache
# ---------------------------------------------------------------------------


def load_qwen3_codec_params(sd: dict, cfg: Qwen3CodecConfig) -> dict:
    """Map the Qwen/Qwen3-TTS-Tokenizer-12Hz decoder checkpoint onto the JAX
    pytree (reference load site: tokenizer/qwen3_codec.py:1816-1843; key
    layout verified against Qwen3TTSTokenizerV2Decoder.state_dict()).

    ``sd``: name -> array in torch layouts (Linear (out,in); Conv1d
    (out,in/groups,k); ConvTranspose1d (in,out,k)). Accepts either
    decoder-level keys (``pre_transformer...``) or full-codec-model keys
    (``decoder.pre_transformer...``) and ignores encoder/quantizer-input
    tensors the decode path never touches.
    """
    if any(k.startswith("decoder.pre_transformer.") for k in sd):
        sd = {k[len("decoder."):]: v for k, v in sd.items()
              if k.startswith("decoder.")}

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]), jnp.float32)

    def lin(prefix):
        p = {"w": arr(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            p["b"] = arr(f"{prefix}.bias")
        return p

    def conv(prefix):
        p = {"w": arr(f"{prefix}.weight")}
        if f"{prefix}.bias" in sd:
            p["b"] = arr(f"{prefix}.bias")
        return p

    def vq_group(prefix, n_q):
        return {
            "embed_sum": jnp.stack([
                arr(f"{prefix}.vq.layers.{i}._codebook.embedding_sum")
                for i in range(n_q)]),
            "usage": jnp.stack([
                arr(f"{prefix}.vq.layers.{i}._codebook.cluster_usage")
                for i in range(n_q)]),
            "out_proj": {"w": arr(f"{prefix}.output_proj.weight")},
        }

    params: dict = {
        "rvq_first": vq_group("quantizer.rvq_first", 1),
        "rvq_rest": vq_group("quantizer.rvq_rest", cfg.num_quantizers - 1),
        "pre_conv": conv("pre_conv.conv"),
    }

    layers = []
    for i in range(cfg.num_layers):
        pre = f"pre_transformer.layers.{i}"
        layers.append({
            "input_norm": arr(f"{pre}.input_layernorm.weight"),
            "post_norm": arr(f"{pre}.post_attention_layernorm.weight"),
            "q": lin(f"{pre}.self_attn.q_proj"),
            "k": lin(f"{pre}.self_attn.k_proj"),
            "v": lin(f"{pre}.self_attn.v_proj"),
            "o": lin(f"{pre}.self_attn.o_proj"),
            "gate": lin(f"{pre}.mlp.gate_proj"),
            "up": lin(f"{pre}.mlp.up_proj"),
            "down": lin(f"{pre}.mlp.down_proj"),
            "ls_attn": arr(f"{pre}.self_attn_layer_scale.scale"),
            "ls_mlp": arr(f"{pre}.mlp_layer_scale.scale"),
        })
    params["transformer"] = {
        "layers": layers,
        "norm": arr("pre_transformer.norm.weight"),
        "input_proj": lin("pre_transformer.input_proj"),
        "output_proj": lin("pre_transformer.output_proj"),
    }

    ups = []
    for i in range(len(cfg.upsampling_ratios)):
        ups.append({
            "trans": conv(f"upsample.{i}.0.conv"),
            "convnext": {
                "dw": conv(f"upsample.{i}.1.dwconv.conv"),
                "norm_w": arr(f"upsample.{i}.1.norm.weight"),
                "norm_b": arr(f"upsample.{i}.1.norm.bias"),
                "pw1": lin(f"upsample.{i}.1.pwconv1"),
                "pw2": lin(f"upsample.{i}.1.pwconv2"),
                "gamma": arr(f"upsample.{i}.1.gamma"),
            },
        })
    params["upsample"] = ups

    dec: dict = {"conv0": conv("decoder.0.conv")}
    blocks = []
    for i in range(len(cfg.upsample_rates)):
        pre = f"decoder.{i + 1}.block"
        res = []
        for j in range(3):
            res.append({
                "alpha1": arr(f"{pre}.{j + 2}.act1.alpha"),
                "beta1": arr(f"{pre}.{j + 2}.act1.beta"),
                "conv1": conv(f"{pre}.{j + 2}.conv1.conv"),
                "alpha2": arr(f"{pre}.{j + 2}.act2.alpha"),
                "beta2": arr(f"{pre}.{j + 2}.act2.beta"),
                "conv2": conv(f"{pre}.{j + 2}.conv2.conv"),
            })
        blocks.append({
            "alpha": arr(f"{pre}.0.alpha"),
            "beta": arr(f"{pre}.0.beta"),
            "trans": conv(f"{pre}.1.conv"),
            "res": res,
        })
    dec["blocks"] = blocks
    n_up = len(cfg.upsample_rates)
    dec["alpha_out"] = arr(f"decoder.{n_up + 1}.alpha")
    dec["beta_out"] = arr(f"decoder.{n_up + 1}.beta")
    dec["head"] = conv(f"decoder.{n_up + 2}.conv")
    params["decoder"] = dec
    return params


def qwen3_codec_init_cache(cfg: Qwen3CodecConfig, batch: int) -> dict:
    W = cfg.sliding_window
    KH, hd = cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers

    def conv_cache(ch, pad):
        return jnp.zeros((batch, ch, pad))

    cache = {
        "pos": jnp.zeros((batch,), jnp.int32),
        # batch axis LEADING on every leaf: the worker gathers/scatters
        # per-slot cache rows with take/set on axis 0
        "attn_k": jnp.zeros((batch, L, W, KH, hd)),
        "attn_v": jnp.zeros((batch, L, W, KH, hd)),
        "pre_conv": conv_cache(cfg.codebook_dim, 2),
        "upsample": [
            {"trans": conv_cache(cfg.latent_dim, 1),
             "convnext_dw": conv_cache(cfg.latent_dim, 6)}
            for _ in cfg.upsampling_ratios
        ],
        "dec_conv0": conv_cache(cfg.latent_dim, 6),
        "dec_blocks": [],
        "head": None,
    }
    for i, rate in enumerate(cfg.upsample_rates):
        in_dim = cfg.decoder_dim // (2 ** i)
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        cache["dec_blocks"].append({
            "trans": conv_cache(in_dim, 1),
            "res": [conv_cache(out_dim, 6 * dil) for dil in (1, 3, 9)],
        })
    final_in = cfg.decoder_dim // (2 ** len(cfg.upsample_rates))
    cache["head"] = conv_cache(final_in, 6)
    return cache


# ---------------------------------------------------------------------------
# building blocks (each returns (y, new_cache); cache=None => full causal pad)
# ---------------------------------------------------------------------------


def _snake_beta(x, alpha, beta):
    a = jnp.exp(alpha)[None, :, None]
    b = jnp.exp(beta)[None, :, None]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def _causal_conv(p, x, pad, cache, dilation=1, groups=1):
    if cache is None:
        xin = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
        new_cache = None
    else:
        xin = jnp.concatenate([cache, x], axis=-1)
        new_cache = xin[:, :, -pad:] if pad > 0 else cache
    y = conv1d(p, xin, padding=0, dilation=dilation, groups=groups)
    return y, new_cache


def _causal_transconv(p, x, stride, kernel, cache):
    """Reference CausalTransConvNet semantics (qwen3_codec.py:343-398):
    full mode trims (kernel - stride) from both sides after ConvTranspose;
    chunk mode prepends last input sample, trims [stride : stride+T*stride]."""
    if cache is None:
        y = conv_transpose1d(p, x, stride=stride)
        trim = kernel - stride
        if trim > 0:
            y = y[:, :, trim:y.shape[-1] - trim]
        # match streaming: first frame has no left context; streaming output
        # for chunk c0 trims [stride:...] of conv([zeros(1), x]) — identical
        # to the full path because conv_transpose of a zero sample adds
        # nothing and offsets align (verified by the chunked-vs-full test)
        return y, None
    xin = jnp.concatenate([cache, x], axis=-1)
    y = conv_transpose1d(p, xin, stride=stride)
    T = x.shape[-1]
    y = y[:, :, stride:stride + T * stride]
    return y, x[:, :, -1:]


def _convnext_block(p, x, cache):
    residual = x
    y, new_cache = _causal_conv(p["dw"], x, 6, cache, groups=x.shape[1])
    y = y.transpose(0, 2, 1)
    y = layer_norm(y, p["norm_w"], p["norm_b"], eps=1e-6)
    y = linear(p["pw1"], y)
    y = jax.nn.gelu(y, approximate=False)
    y = linear(p["pw2"], y)
    y = p["gamma"] * y
    y = y.transpose(0, 2, 1)
    return residual + y, new_cache


def _residual_unit(p, x, dilation, cache):
    res = x
    y = _snake_beta(x, p["alpha1"], p["beta1"])
    y, new_cache = _causal_conv(p["conv1"], y, 6 * dilation, cache,
                                dilation=dilation)
    y = _snake_beta(y, p["alpha2"], p["beta2"])
    y = conv1d(p["conv2"], y)
    return res + y, new_cache


# ---- channels-last (NHC) decoder section ----------------------------------
# The waveform decoder's narrow-channel blocks run ~1.15-1.2x faster with C
# on the TPU's 128-lane minor axis (artifacts/conv_forms_r4.md). Activations
# are (B, T, C) between dec conv0 and the head; streaming caches KEEP the
# (B, C, pad) layout of the NCH path (identical pytrees either way — the
# worker's slot gather/scatter and on-the-wire state are layout-agnostic,
# and the pads are <=54 samples so the transposes are free).


def use_codec_nhc() -> bool:
    """Gate: VOX_CODEC_NHC=0 opts out (A/B vs the NCH path)."""
    return os.environ.get("VOX_CODEC_NHC", "1") != "0"


def _snake_beta_nhc(x, alpha, beta):
    a = jnp.exp(alpha)[None, None, :]
    b = jnp.exp(beta)[None, None, :]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def _causal_conv_nhc(p, x, pad, cache, dilation=1, groups=1):
    if cache is None:
        xin = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        new_cache = None
    else:
        xin = jnp.concatenate([cache.transpose(0, 2, 1), x], axis=1)
        new_cache = (xin[:, -pad:].transpose(0, 2, 1) if pad > 0 else cache)
    y = conv1d_nhc(p, xin, padding=0, dilation=dilation, groups=groups)
    return y, new_cache


def _causal_transconv_nhc(p, x, stride, kernel, cache):
    """NHC twin of _causal_transconv (same trim semantics)."""
    if cache is None:
        y = conv_transpose1d_nhc(p, x, stride=stride)
        trim = kernel - stride
        if trim > 0:
            y = y[:, trim:y.shape[1] - trim]
        return y, None
    xin = jnp.concatenate([cache.transpose(0, 2, 1), x], axis=1)
    y = conv_transpose1d_nhc(p, xin, stride=stride)
    T = x.shape[1]
    y = y[:, stride:stride + T * stride]
    return y, x[:, -1:].transpose(0, 2, 1)


def _residual_unit_nhc(p, x, dilation, cache):
    res = x
    y = _snake_beta_nhc(x, p["alpha1"], p["beta1"])
    y, new_cache = _causal_conv_nhc(p["conv1"], y, 6 * dilation, cache,
                                    dilation=dilation)
    y = _snake_beta_nhc(y, p["alpha2"], p["beta2"])
    y = conv1d_nhc(p["conv2"], y)
    return res + y, new_cache


def _decoder_blocks_nhc(dec, cfg, wav, cache):
    """dec conv0 output (B, C, T) -> final waveform (B, 1, T_samples),
    running every block in channels-last layout."""
    h = wav.transpose(0, 2, 1)                             # (B, T, C)
    new_blocks = []
    for i, (b, rate) in enumerate(zip(dec["blocks"], cfg.upsample_rates)):
        bc = None if cache is None else cache["dec_blocks"][i]
        h = _snake_beta_nhc(h, b["alpha"], b["beta"])
        h, t_cache = _causal_transconv_nhc(
            b["trans"], h, rate, 2 * rate,
            None if bc is None else bc["trans"])
        res_caches = []
        for j, dil in enumerate((1, 3, 9)):
            h, rcache = _residual_unit_nhc(
                b["res"][j], h, dil, None if bc is None else bc["res"][j])
            res_caches.append(rcache)
        new_blocks.append({"trans": t_cache, "res": res_caches})
    h = _snake_beta_nhc(h, dec["alpha_out"], dec["beta_out"])
    h, head_cache = _causal_conv_nhc(
        dec["head"], h, 6, None if cache is None else cache["head"])
    return h.transpose(0, 2, 1), new_blocks, head_cache


# ---------------------------------------------------------------------------
# RVQ decode
# ---------------------------------------------------------------------------


def _rvq_decode(group: dict, codes: jax.Array) -> jax.Array:
    """codes: (B, n_q, T) -> (B, codebook_dim, T)."""
    embed = group["embed_sum"] / jnp.clip(group["usage"], 1e-5)[..., None]
    # (B, n_q, T, vq_dim) summed over quantizers
    q = jax.vmap(lambda e, c: jnp.take(e, c, axis=0), in_axes=(0, 1),
                 out_axes=1)(embed, codes)
    summed = jnp.sum(q, axis=1)  # (B, T, vq_dim)
    return conv1d(group["out_proj"], summed.transpose(0, 2, 1))


def qwen3_rvq_decode(params: dict, cfg: Qwen3CodecConfig,
                     codes: jax.Array) -> jax.Array:
    """(B, 16, T) -> (B, 512, T): semantic (cb 0) + acoustic (cb 1..15)."""
    sem = _rvq_decode(params["rvq_first"], codes[:, :1])
    ac = _rvq_decode(params["rvq_rest"], codes[:, 1:])
    return sem + ac


# ---------------------------------------------------------------------------
# sliding-window transformer
# ---------------------------------------------------------------------------


def _transformer(params: dict, cfg: Qwen3CodecConfig, x: jax.Array,
                 cache: dict | None):
    """x: (B, T, latent) -> (B, T, latent). Sliding-window causal attention
    with optional rolling KV cache."""
    tp = params["transformer"]
    B, T, _ = x.shape
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    W = cfg.sliding_window
    inv_freq = rope_frequencies(hd, theta=cfg.rope_theta)

    h = linear(tp["input_proj"], x)

    # Exact reference attention semantics (qwen3_codec.py:573-668): batch
    # forward is PLAIN causal (SDPA is_causal, no sliding mask); streaming
    # attends over the whole W-slot cache buffer — including zero-filled
    # slots — with a buffer-causal mask only (q at buffer position W+i sees
    # kv j <= W+i). The sliding window is enforced by the cache SIZE, never
    # by a mask, and zero K/V slots act as attention sinks by design.
    if cache is None:
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))  # (B, T)
        p = jnp.arange(T, dtype=jnp.int32)
        mask = (p[None, :] <= p[:, None])
        mask = jnp.tile(mask[None], (B, 1, 1))  # (B, T, T)
        offset = None
    else:
        assert T <= W, f"chunk of {T} tokens exceeds the {W}-slot KV ring"
        offset = cache["pos"]                                   # (B,)
        pos = offset[:, None] + jnp.arange(T, dtype=jnp.int32)  # (B, T)
        # reference order: the ring is updated FIRST (shift left by T, new
        # K/V at the end), then attention runs over exactly the W slots.
        # query i sits at ring index W-T+i and sees ring j <= W-T+i.
        kv_j = jnp.arange(W, dtype=jnp.int32)
        q_i = W - T + jnp.arange(T, dtype=jnp.int32)
        mask = jnp.tile((kv_j[None, :] <= q_i[:, None])[None], (B, 1, 1))

    def rope(q, positions):
        # q: (B, t, heads, hd); positions: (B, t); split-half rotation
        angles = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
        cos = jnp.cos(angles)[:, :, None, :]
        sin = jnp.sin(angles)[:, :, None, :]
        q1, q2 = q[..., :hd // 2], q[..., hd // 2:]
        return jnp.concatenate([q1 * cos - q2 * sin, q2 * cos + q1 * sin],
                               axis=-1)

    new_cache_k = [] if cache is not None else None
    new_cache_v = [] if cache is not None else None

    for li, lp in enumerate(tp["layers"]):
        xin = rms_norm(h, lp["input_norm"], cfg.rms_eps)
        q = linear(lp["q"], xin).reshape(B, T, H, hd)
        k = linear(lp["k"], xin).reshape(B, T, KH, hd)
        v = linear(lp["v"], xin).reshape(B, T, KH, hd)
        q = rope(q, pos)
        k = rope(k, pos)

        if cache is None:
            k_all, v_all = k, v
        else:
            # update-then-attend: ring = [old[T:], new] (W slots)
            k_all = jnp.concatenate([cache["attn_k"][:, li], k],
                                    axis=1)[:, -W:]  # (B, W, KH, hd)
            v_all = jnp.concatenate([cache["attn_v"][:, li], v],
                                    axis=1)[:, -W:]
            new_cache_k.append(k_all)
            new_cache_v.append(v_all)
        att_mask = mask

        rep = H // KH
        k_r = jnp.repeat(k_all, rep, axis=2) if rep > 1 else k_all
        v_r = jnp.repeat(v_all, rep, axis=2) if rep > 1 else v_all
        scale = 1.0 / math.sqrt(hd)
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k_r)
        scores = jnp.where(att_mask[:, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v_r).reshape(B, T, H * hd)
        h = h + lp["ls_attn"] * linear(lp["o"], attn)

        xin2 = rms_norm(h, lp["post_norm"], cfg.rms_eps)
        mlp = linear(lp["down"],
                     jax.nn.silu(linear(lp["gate"], xin2)) * linear(lp["up"], xin2))
        h = h + lp["ls_mlp"] * mlp

    h = rms_norm(h, tp["norm"], cfg.rms_eps)
    out = linear(tp["output_proj"], h)

    new_cache = None
    if cache is not None:
        new_cache = dict(cache)
        new_cache["attn_k"] = jnp.stack(new_cache_k, axis=1)
        new_cache["attn_v"] = jnp.stack(new_cache_v, axis=1)
        new_cache["pos"] = cache["pos"] + T
    return out, new_cache


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def _pipeline(params: dict, cfg: Qwen3CodecConfig, codes: jax.Array,
              cache: dict | None):
    def c(path):
        return None if cache is None else path

    hidden = qwen3_rvq_decode(params, cfg, codes)  # (B, 512, T)
    hidden, pre_cache = _causal_conv(
        params["pre_conv"], hidden, 2, c(cache and cache["pre_conv"]))
    hidden = hidden.transpose(0, 2, 1)  # (B, T, latent)

    hidden, tr_cache = _transformer(params, cfg, hidden, cache)
    hidden = hidden.transpose(0, 2, 1)  # (B, latent, T)

    new_ups = []
    for i, (stage, factor) in enumerate(zip(params["upsample"],
                                            cfg.upsampling_ratios)):
        sc = None if cache is None else cache["upsample"][i]
        hidden, t_cache = _causal_transconv(
            stage["trans"], hidden, factor, factor,
            None if sc is None else sc["trans"])
        hidden, d_cache = _convnext_block(
            stage["convnext"], hidden,
            None if sc is None else sc["convnext_dw"])
        new_ups.append({"trans": t_cache, "convnext_dw": d_cache})

    dec = params["decoder"]
    wav, c0_cache = _causal_conv(
        dec["conv0"], hidden, 6, None if cache is None else cache["dec_conv0"])
    if use_codec_nhc() and not use_fused_resunit():
        # channels-last decoder section (default; ~1.2x on the narrow
        # blocks — see _decoder_blocks_nhc)
        wav, new_blocks, head_cache = _decoder_blocks_nhc(dec, cfg, wav, cache)
    else:
        new_blocks = []
        for i, (b, rate) in enumerate(zip(dec["blocks"], cfg.upsample_rates)):
            bc = None if cache is None else cache["dec_blocks"][i]
            wav = _snake_beta(wav, b["alpha"], b["beta"])
            wav, t_cache = _causal_transconv(
                b["trans"], wav, rate, 2 * rate,
                None if bc is None else bc["trans"])
            if use_fused_resunit() and wav.shape[-1] > 54:
                # fused Pallas stack (opt-in experiment; measured LOSING —
                # ops/pallas_resunit.py docstring)
                wav, res_caches = fused_resunit_stack(
                    wav, b["res"],
                    None if bc is None else [bc["res"][j] for j in range(3)],
                    interpret=default_interpret())
            else:
                res_caches = []
                for j, dil in enumerate((1, 3, 9)):
                    wav, rcache = _residual_unit(
                        b["res"][j], wav, dil,
                        None if bc is None else bc["res"][j])
                    res_caches.append(rcache)
            new_blocks.append({"trans": t_cache, "res": res_caches})
        wav = _snake_beta(wav, dec["alpha_out"], dec["beta_out"])
        wav, head_cache = _causal_conv(
            dec["head"], wav, 6, None if cache is None else cache["head"])
    wav = jnp.clip(wav, -1.0, 1.0)

    new_cache = None
    if cache is not None:
        new_cache = {
            "pos": tr_cache["pos"],
            "attn_k": tr_cache["attn_k"],
            "attn_v": tr_cache["attn_v"],
            "pre_conv": pre_cache,
            "upsample": new_ups,
            "dec_conv0": c0_cache,
            "dec_blocks": new_blocks,
            "head": head_cache,
        }
    return wav, new_cache


def qwen3_codec_decode(params: dict, cfg: Qwen3CodecConfig,
                       codes: jax.Array) -> jax.Array:
    """Full decode: (B, 16, T) -> (B, 1, T * 1920).

    Runs the streaming pipeline from a fresh cache in ring-sized chunks —
    the canonical serving path (the reference's batch ``forward`` trims
    (kernel-stride) from both edges of every trans-conv and uses plain
    causal attention, so it is NOT sample-aligned with streaming; the
    published demo decodes via forward_chunk, which this matches —
    golden-tested in tests/test_qwen3_codec_parity.py)."""
    cache = qwen3_codec_init_cache(cfg, codes.shape[0])
    W = cfg.sliding_window
    outs = []
    for s in range(0, codes.shape[-1], W):
        wav, cache = _pipeline(params, cfg, codes[:, :, s:s + W], cache)
        outs.append(wav)
    return jnp.concatenate(outs, axis=-1)


def qwen3_codec_decode_chunk(params: dict, cfg: Qwen3CodecConfig,
                             codes: jax.Array, cache: dict):
    """Streaming decode of one chunk with functional cache."""
    return _pipeline(params, cfg, codes, cache)
