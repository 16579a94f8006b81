"""Mimi codec (Moshi family) — weight-exact decode path for CSM-1B.

Matches the HF ``MimiModel`` decode pipeline (the reference loads it via
``CsmForConditionalGeneration.from_pretrained``, model/csm.py:329, with the
codec under ``codec_model.*``; standalone reference impl at
tokenizer/mimi.py:2702-3089):

    split RVQ (1 semantic + 31 acoustic, EuclideanCodebook embed_sum /
    cluster_usage, per-group output_proj 256->512)
    -> depthwise causal trans-conv x2 upsample (k=4, s=2, groups=512)
    -> 8-layer transformer @25 Hz (LayerNorm+bias, GELU fc1/fc2, LayerScale,
       RoPE, 250-token sliding window) — NO final norm
    -> SEANet decoder (ELU + causal convs, trans-conv rates 8,6,5,4 with one
       dim/2 bottleneck residual unit each) -> 24 kHz, 1920 samples/frame.

Streaming is position-exact (the reference RingKVCache masks unwritten slots,
tokenizer/mimi.py:1290-1305), so chunked decode equals full decode —
asserted in tests/test_mimi_parity.py together with golden parity vs the HF
torch module through ``load_mimi_params``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import _init_linear, linear
from ..ops.norms import layer_norm
from ..ops.rope import rope_frequencies
from .layers import conv1d, conv_transpose1d, init_conv1d, init_conv_transpose1d

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    n_codebooks: int = 32
    codebook_size: int = 2048
    vq_dim: int = 256
    hidden_size: int = 512          # transformer width == quantizer output
    intermediate_size: int = 2048
    head_dim: int = 64
    num_heads: int = 8
    num_kv_heads: int = 8
    num_layers: int = 8
    sliding_window: int = 250
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    num_filters: int = 64
    upsample_ratios: tuple[int, ...] = (8, 6, 5, 4)
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3

    @property
    def seanet_in(self) -> int:
        return self.num_filters * (2 ** len(self.upsample_ratios))

    @property
    def frame_samples(self) -> int:
        return int(math.prod(self.upsample_ratios)) * 2  # x2 upsample first


def init_mimi(cfg: MimiConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 256))

    def nk():
        return next(keys)

    def vq_group(n_q):
        return {
            "embed_sum": jax.random.normal(
                nk(), (n_q, cfg.codebook_size, cfg.vq_dim)) * 0.02,
            "usage": jnp.ones((n_q, cfg.codebook_size)),
            "out_proj": init_conv1d(nk(), cfg.vq_dim, cfg.hidden_size, 1,
                                    bias=False),
        }

    hs = cfg.hidden_size
    H, hd, KH = cfg.num_heads, cfg.head_dim, cfg.num_kv_heads
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1_w": jnp.ones((hs,)), "ln1_b": jnp.zeros((hs,)),
            "ln2_w": jnp.ones((hs,)), "ln2_b": jnp.zeros((hs,)),
            "q": _init_linear(nk(), hs, H * hd, jnp.float32),
            "k": _init_linear(nk(), hs, KH * hd, jnp.float32),
            "v": _init_linear(nk(), hs, KH * hd, jnp.float32),
            "o": _init_linear(nk(), H * hd, hs, jnp.float32),
            "fc1": _init_linear(nk(), hs, cfg.intermediate_size, jnp.float32),
            "fc2": _init_linear(nk(), cfg.intermediate_size, hs, jnp.float32),
            "ls_attn": jnp.full((hs,), 0.01),
            "ls_mlp": jnp.full((hs,), 0.01),
        })

    dim = cfg.seanet_in
    blocks = []
    for i, ratio in enumerate(cfg.upsample_ratios):
        cin = dim // (2 ** i)
        out = dim // (2 ** (i + 1))
        blocks.append({
            "trans": init_conv_transpose1d(nk(), cin, out, 2 * ratio),
            "res_conv1": init_conv1d(nk(), out, out // 2,
                                     cfg.residual_kernel_size),
            "res_conv2": init_conv1d(nk(), out // 2, out, 1),
        })
    final_in = dim // (2 ** len(cfg.upsample_ratios))
    return {
        "rvq_first": vq_group(1),
        "rvq_rest": vq_group(cfg.n_codebooks - 1),
        "transformer": {"layers": layers},
        # depthwise x2 upsample (HF: MimiConvTranspose1d groups=512, no bias)
        "upsample_trans": init_conv_transpose1d(
            nk(), cfg.hidden_size, cfg.hidden_size, 4, groups=cfg.hidden_size,
            bias=False),
        "dec_conv0": init_conv1d(nk(), cfg.hidden_size, dim, cfg.kernel_size),
        "blocks": blocks,
        "head": init_conv1d(nk(), final_in, 1, cfg.last_kernel_size),
    }


def init_mimi_encoder(cfg: MimiConfig, key: jax.Array) -> dict:
    """Encoder params (audio -> codes): SEANet encoder, encoder transformer,
    x2 downsample, per-group RVQ input projections. Used for CSM audio
    context prompts and voice-clone reference tokenization."""
    keys = iter(jax.random.split(key, 256))

    def nk():
        return next(keys)

    hs = cfg.hidden_size
    H, hd, KH = cfg.num_heads, cfg.head_dim, cfg.num_kv_heads
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1_w": jnp.ones((hs,)), "ln1_b": jnp.zeros((hs,)),
            "ln2_w": jnp.ones((hs,)), "ln2_b": jnp.zeros((hs,)),
            "q": _init_linear(nk(), hs, H * hd, jnp.float32),
            "k": _init_linear(nk(), hs, KH * hd, jnp.float32),
            "v": _init_linear(nk(), hs, KH * hd, jnp.float32),
            "o": _init_linear(nk(), H * hd, hs, jnp.float32),
            "fc1": _init_linear(nk(), hs, cfg.intermediate_size, jnp.float32),
            "fc2": _init_linear(nk(), cfg.intermediate_size, hs, jnp.float32),
            "ls_attn": jnp.full((hs,), 0.01),
            "ls_mlp": jnp.full((hs,), 0.01),
        })

    blocks = []
    f = cfg.num_filters
    for j, ratio in enumerate(reversed(cfg.upsample_ratios)):
        cin = f * (2 ** j)
        blocks.append({
            "res_conv1": init_conv1d(nk(), cin, cin // 2,
                                     cfg.residual_kernel_size),
            "res_conv2": init_conv1d(nk(), cin // 2, cin, 1),
            "down": init_conv1d(nk(), cin, 2 * cin, 2 * ratio),
        })
    def vq_group(n_q):
        return {
            "embed_sum": jax.random.normal(
                nk(), (n_q, cfg.codebook_size, cfg.vq_dim)) * 0.02,
            "usage": jnp.ones((n_q, cfg.codebook_size)),
        }

    return {
        "enc_conv0": init_conv1d(nk(), 1, f, cfg.kernel_size),
        "enc_blocks": blocks,
        "enc_final": init_conv1d(nk(), cfg.seanet_in, hs,
                                 cfg.last_kernel_size),
        "enc_transformer": {"layers": layers},
        "downsample": init_conv1d(nk(), hs, hs, 4, bias=False),
        "in_proj_first": init_conv1d(nk(), hs, cfg.vq_dim, 1, bias=False),
        "in_proj_rest": init_conv1d(nk(), hs, cfg.vq_dim, 1, bias=False),
        "rvq_first": vq_group(1),
        "rvq_rest": vq_group(cfg.n_codebooks - 1),
    }


def load_mimi_encoder_params(sd: dict, cfg: MimiConfig,
                             prefix: str = "") -> dict:
    """Map the HF MimiModel ENCODER state_dict onto the JAX pytree."""
    def arr(name):
        return jnp.asarray(np.asarray(sd[prefix + name]), jnp.float32)

    def lin(name):
        p = {"w": arr(f"{name}.weight").T}
        if prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    def conv(name):
        p = {"w": arr(f"{name}.weight")}
        if prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder_transformer.layers.{i}"
        layers.append({
            "ln1_w": arr(f"{pre}.input_layernorm.weight"),
            "ln1_b": arr(f"{pre}.input_layernorm.bias"),
            "ln2_w": arr(f"{pre}.post_attention_layernorm.weight"),
            "ln2_b": arr(f"{pre}.post_attention_layernorm.bias"),
            "q": lin(f"{pre}.self_attn.q_proj"),
            "k": lin(f"{pre}.self_attn.k_proj"),
            "v": lin(f"{pre}.self_attn.v_proj"),
            "o": lin(f"{pre}.self_attn.o_proj"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
            "ls_attn": arr(f"{pre}.self_attn_layer_scale.scale"),
            "ls_mlp": arr(f"{pre}.mlp_layer_scale.scale"),
        })
    blocks = []
    for j in range(len(cfg.upsample_ratios)):
        blocks.append({
            "res_conv1": conv(f"encoder.layers.{1 + 3 * j}.block.1.conv"),
            "res_conv2": conv(f"encoder.layers.{1 + 3 * j}.block.3.conv"),
            "down": conv(f"encoder.layers.{3 + 3 * j}.conv"),
        })
    def vq_group(name, n_q):
        return {
            "embed_sum": jnp.stack([
                arr(f"quantizer.{name}.layers.{i}.codebook.embed_sum")
                for i in range(n_q)]),
            "usage": jnp.stack([
                arr(f"quantizer.{name}.layers.{i}.codebook.cluster_usage")
                for i in range(n_q)]),
        }

    return {
        "enc_conv0": conv("encoder.layers.0.conv"),
        "enc_blocks": blocks,
        "enc_final": conv(
            f"encoder.layers.{2 + 3 * len(cfg.upsample_ratios)}.conv"),
        "enc_transformer": {"layers": layers},
        "downsample": conv("downsample.conv"),
        "in_proj_first": {"w": arr(
            "quantizer.semantic_residual_vector_quantizer.input_proj.weight")},
        "in_proj_rest": {"w": arr(
            "quantizer.acoustic_residual_vector_quantizer.input_proj.weight")},
        "rvq_first": vq_group("semantic_residual_vector_quantizer", 1),
        "rvq_rest": vq_group("acoustic_residual_vector_quantizer",
                             cfg.n_codebooks - 1),
    }


def _enc_causal_conv(p, x, kernel, stride=1, dilation=1):
    """HF MimiConv1d causal padding: pad_left = k_eff - stride, plus right
    extra so the last frame is full (modeling_mimi MimiConv1d)."""
    k_eff = (kernel - 1) * dilation + 1
    pad_total = k_eff - stride
    length = x.shape[-1]
    n_frames = (length - k_eff + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad_total)
    extra = int(ideal - length)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_total, max(extra, 0))))
    return conv1d(p, x, stride=stride, dilation=dilation)


def _rvq_encode(embed_sum, usage, z, n_q):
    """z (B, T, vq) -> codes (B, n_q, T) by residual nearest-centroid."""
    embed = embed_sum / jnp.clip(usage, 1e-5)[..., None]  # (n_q, bins, vq)
    codes = []
    residual = z
    for i in range(n_q):
        e = embed[i]                                     # (bins, vq)
        d = (jnp.sum(jnp.square(residual), -1, keepdims=True)
             - 2.0 * residual @ e.T
             + jnp.sum(jnp.square(e), -1)[None, None, :])
        idx = jnp.argmin(d, axis=-1)                     # (B, T)
        residual = residual - jnp.take(e, idx, axis=0)
        codes.append(idx)
    return jnp.stack(codes, axis=1).astype(jnp.int32)


def mimi_encode(enc_params: dict, dec_params: dict | None, cfg: MimiConfig,
                audio: jax.Array) -> jax.Array:
    """audio (B, S) float -> codes (B, n_codebooks, T) at 12.5 Hz.

    HF order (modeling_mimi._encode_frame): SEANet encoder -> encoder
    transformer -> x2 downsample -> split RVQ encode. Codebooks come from
    enc_params when present (the Qwen3 codec encoder owns its quantizer),
    else from the decoder pytree (shared in plain Mimi)."""
    vq = enc_params if "rvq_first" in enc_params else dec_params
    x = audio[:, None, :]
    x = _enc_causal_conv(enc_params["enc_conv0"], x, cfg.kernel_size)
    for j, ratio in enumerate(reversed(cfg.upsample_ratios)):
        b = enc_params["enc_blocks"][j]
        r = jax.nn.elu(x)
        r = _enc_causal_conv(b["res_conv1"], r, cfg.residual_kernel_size)
        r = jax.nn.elu(r)
        r = conv1d(b["res_conv2"], r)
        x = x + r
        x = jax.nn.elu(x)
        x = _enc_causal_conv(b["down"], x, 2 * ratio, stride=ratio)
    x = jax.nn.elu(x)
    x = _enc_causal_conv(enc_params["enc_final"], x, cfg.last_kernel_size)

    h, _ = _mimi_transformer({"transformer": enc_params["enc_transformer"]},
                             cfg, x.transpose(0, 2, 1), None)
    x = h.transpose(0, 2, 1)
    x = _enc_causal_conv(enc_params["downsample"], x, 4, stride=2)

    z_sem = conv1d(enc_params["in_proj_first"], x).transpose(0, 2, 1)
    z_ac = conv1d(enc_params["in_proj_rest"], x).transpose(0, 2, 1)
    sem = _rvq_encode(vq["rvq_first"]["embed_sum"],
                      vq["rvq_first"]["usage"], z_sem, 1)
    ac = _rvq_encode(vq["rvq_rest"]["embed_sum"],
                     vq["rvq_rest"]["usage"], z_ac,
                     cfg.n_codebooks - 1)
    return jnp.concatenate([sem, ac], axis=1)


def load_mimi_params(sd: dict, cfg: MimiConfig, prefix: str = "") -> dict:
    """Map the HF MimiModel state_dict (optionally under a prefix, e.g.
    ``codec_model.`` inside sesame/csm-1b) onto the JAX pytree. Only the
    decode path is loaded."""
    def arr(name):
        return jnp.asarray(np.asarray(sd[prefix + name]), jnp.float32)

    def lin(name):
        p = {"w": arr(f"{name}.weight").T}
        if prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    def conv(name):
        p = {"w": arr(f"{name}.weight")}
        if prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    def vq_group(name, n_q):
        return {
            "embed_sum": jnp.stack([
                arr(f"quantizer.{name}.layers.{i}.codebook.embed_sum")
                for i in range(n_q)]),
            "usage": jnp.stack([
                arr(f"quantizer.{name}.layers.{i}.codebook.cluster_usage")
                for i in range(n_q)]),
            "out_proj": {"w": arr(f"quantizer.{name}.output_proj.weight")},
        }

    layers = []
    for i in range(cfg.num_layers):
        pre = f"decoder_transformer.layers.{i}"
        layers.append({
            "ln1_w": arr(f"{pre}.input_layernorm.weight"),
            "ln1_b": arr(f"{pre}.input_layernorm.bias"),
            "ln2_w": arr(f"{pre}.post_attention_layernorm.weight"),
            "ln2_b": arr(f"{pre}.post_attention_layernorm.bias"),
            "q": lin(f"{pre}.self_attn.q_proj"),
            "k": lin(f"{pre}.self_attn.k_proj"),
            "v": lin(f"{pre}.self_attn.v_proj"),
            "o": lin(f"{pre}.self_attn.o_proj"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
            "ls_attn": arr(f"{pre}.self_attn_layer_scale.scale"),
            "ls_mlp": arr(f"{pre}.mlp_layer_scale.scale"),
        })

    blocks = []
    for i in range(len(cfg.upsample_ratios)):
        blocks.append({
            "trans": conv(f"decoder.layers.{2 + 3 * i}.conv"),
            "res_conv1": conv(f"decoder.layers.{3 + 3 * i}.block.1.conv"),
            "res_conv2": conv(f"decoder.layers.{3 + 3 * i}.block.3.conv"),
        })
    return {
        "rvq_first": vq_group("semantic_residual_vector_quantizer", 1),
        "rvq_rest": vq_group("acoustic_residual_vector_quantizer",
                             cfg.n_codebooks - 1),
        "transformer": {"layers": layers},
        "upsample_trans": conv("upsample.conv"),
        "dec_conv0": conv("decoder.layers.0.conv"),
        "blocks": blocks,
        "head": conv(f"decoder.layers.{2 + 3 * len(cfg.upsample_ratios)}.conv"),
    }


# ---------------------------------------------------------------------------
# streaming cache
# ---------------------------------------------------------------------------


def mimi_init_cache(cfg: MimiConfig, batch: int) -> dict:
    W = cfg.sliding_window
    cache = {
        "pos": jnp.zeros((batch,), jnp.int32),
        "attn_len": jnp.zeros((batch,), jnp.int32),
        "attn_k": jnp.zeros((batch, cfg.num_layers, W, cfg.num_kv_heads,
                             cfg.head_dim)),
        "attn_v": jnp.zeros((batch, cfg.num_layers, W, cfg.num_kv_heads,
                             cfg.head_dim)),
        "up_trans": jnp.zeros((batch, cfg.hidden_size, 1)),
        "dec_conv0": jnp.zeros((batch, cfg.hidden_size, cfg.kernel_size - 1)),
        "blocks": [],
        "head": None,
    }
    dim = cfg.seanet_in
    for i, _ in enumerate(cfg.upsample_ratios):
        out = dim // (2 ** (i + 1))
        cache["blocks"].append({
            "trans": jnp.zeros((batch, dim // (2 ** i), 1)),
            "res": jnp.zeros((batch, out, cfg.residual_kernel_size - 1)),
        })
    final_in = dim // (2 ** len(cfg.upsample_ratios))
    cache["head"] = jnp.zeros((batch, final_in, cfg.last_kernel_size - 1))
    return cache


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _causal_conv(p, x, pad, cache, dilation=1, groups=1):
    if cache is None:
        xin = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
        new_cache = None
    else:
        xin = jnp.concatenate([cache, x], axis=-1)
        new_cache = xin[:, :, -pad:] if pad > 0 else cache
    y = conv1d(p, xin, padding=0, dilation=dilation, groups=groups)
    return y, new_cache


def _causal_transconv(p, x, stride, kernel, cache, groups=1):
    """HF MimiConvTranspose1d causal semantics (trim_right_ratio=1: trim all
    k-s padding from the RIGHT). Streaming: prepend the last input sample,
    keep outputs [stride : stride + T*stride] — identical to the full path
    because a zero previous sample contributes nothing at those taps."""
    if cache is None:
        cache = jnp.zeros((x.shape[0], x.shape[1], 1), x.dtype)
        own = True
    else:
        own = False
    xin = jnp.concatenate([cache, x], axis=-1)
    y = conv_transpose1d(p, xin, stride=stride, groups=groups)
    T = x.shape[-1]
    y = y[:, :, stride:stride + T * stride]
    return y, (None if own else x[:, :, -1:])


def _rvq_decode(group: dict, codes: jax.Array) -> jax.Array:
    embed = group["embed_sum"] / jnp.clip(group["usage"], 1e-5)[..., None]
    q = jax.vmap(lambda e, c: jnp.take(e, c, axis=0), in_axes=(0, 1),
                 out_axes=1)(embed, codes)
    summed = jnp.sum(q, axis=1)
    return conv1d(group["out_proj"], summed.transpose(0, 2, 1))


def _mimi_transformer(params: dict, cfg: MimiConfig, x: jax.Array,
                      cache: dict | None):
    """x: (B, T, hidden). Position-exact sliding-window attention: streaming
    masks unwritten ring slots (reference RingKVCache, mimi.py:1290-1305),
    so chunked == full."""
    B, T, _ = x.shape
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    W = cfg.sliding_window
    inv_freq = rope_frequencies(hd, theta=cfg.rope_theta)

    if cache is None:
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
        p = jnp.arange(T, dtype=jnp.int32)
        mask = ((p[None, :] <= p[:, None]) & (p[None, :] > p[:, None] - W))
        mask = jnp.tile(mask[None], (B, 1, 1))          # (B, T, T)
        offset = attn_len = None
    else:
        offset = cache["pos"]                            # (B,)
        pos = offset[:, None] + jnp.arange(T, dtype=jnp.int32)
        attn_len = cache["attn_len"]

    def rope(q, positions):
        ang = positions[..., None].astype(jnp.float32) * inv_freq[None, None]
        cos = jnp.cos(ang)[:, :, None, :]
        sin = jnp.sin(ang)[:, :, None, :]
        q1, q2 = q[..., :hd // 2], q[..., hd // 2:]
        return jnp.concatenate([q1 * cos - q2 * sin, q2 * cos + q1 * sin],
                               axis=-1)

    h = x
    new_k, new_v = [], []
    for li, lp in enumerate(params["transformer"]["layers"]):
        xin = layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps=cfg.norm_eps)
        q = linear(lp["q"], xin).reshape(B, T, H, hd)
        k = linear(lp["k"], xin).reshape(B, T, KH, hd)
        v = linear(lp["v"], xin).reshape(B, T, KH, hd)
        q, k = rope(q, pos), rope(k, pos)

        if cache is None:
            k_all, v_all = k, v
            att_mask = mask
        else:
            k_all = jnp.concatenate([cache["attn_k"][:, li], k], axis=1)
            v_all = jnp.concatenate([cache["attn_v"][:, li], v], axis=1)
            kpos = jnp.concatenate([
                offset[:, None] - W + jnp.arange(W, dtype=jnp.int32)[None],
                pos], axis=1)                            # (B, W+T)
            valid = kpos >= (offset - jnp.minimum(attn_len, W))[:, None]
            qpos = pos[:, :, None]
            att_mask = ((kpos[:, None, :] <= qpos)
                        & (kpos[:, None, :] > qpos - W)
                        & valid[:, None, :])             # (B, T, W+T)
            new_k.append(k_all[:, -W:])
            new_v.append(v_all[:, -W:])

        rep = H // KH
        k_r = jnp.repeat(k_all, rep, axis=2) if rep > 1 else k_all
        v_r = jnp.repeat(v_all, rep, axis=2) if rep > 1 else v_all
        scale = 1.0 / math.sqrt(hd)
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k_r)
        scores = jnp.where(att_mask[:, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v_r).reshape(B, T, H * hd)
        h = h + lp["ls_attn"] * linear(lp["o"], attn)

        xin2 = layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps=cfg.norm_eps)
        mlp = linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], xin2),
                                            approximate=False))
        h = h + lp["ls_mlp"] * mlp

    new_cache = None
    if cache is not None:
        new_cache = dict(cache)
        new_cache["attn_k"] = jnp.stack(new_k, axis=1)
        new_cache["attn_v"] = jnp.stack(new_v, axis=1)
        new_cache["pos"] = cache["pos"] + T
        new_cache["attn_len"] = jnp.minimum(cache["attn_len"] + T, W)
    return h, new_cache


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def mimi_decode_chunk(params: dict, cfg: MimiConfig, codes: jax.Array,
                      cache: dict | None):
    """codes (B, 32, T) -> (waveform (B, 1, T * 1920), new cache).

    HF decode order (modeling_mimi._decode_frame): quantizer -> x2 upsample
    -> transformer (@25 Hz) -> SEANet decoder."""
    own_cache = cache is None
    if own_cache:
        cache = mimi_init_cache(cfg, codes.shape[0])

    z = _rvq_decode(params["rvq_first"], codes[:, :1]) + _rvq_decode(
        params["rvq_rest"], codes[:, 1:])               # (B, 512, T)

    # x2 depthwise upsample (12.5 Hz -> 25 Hz)
    h, up_cache = _causal_transconv(params["upsample_trans"], z, 2, 4,
                                    None if own_cache else cache["up_trans"],
                                    groups=cfg.hidden_size)

    h, tr_cache = _mimi_transformer(params, cfg, h.transpose(0, 2, 1),
                                    None if own_cache else cache)
    x = h.transpose(0, 2, 1)                            # (B, hidden, 2T)

    x, c0 = _causal_conv(params["dec_conv0"], x, cfg.kernel_size - 1,
                         None if own_cache else cache["dec_conv0"])
    new_blocks = []
    for i, (b, ratio) in enumerate(zip(params["blocks"], cfg.upsample_ratios)):
        bc = None if own_cache else cache["blocks"][i]
        x = jax.nn.elu(x)
        x, t_cache = _causal_transconv(b["trans"], x, ratio, 2 * ratio,
                                       None if bc is None else bc["trans"])
        r = jax.nn.elu(x)
        r, rc = _causal_conv(b["res_conv1"], r, cfg.residual_kernel_size - 1,
                             None if bc is None else bc["res"])
        r = jax.nn.elu(r)
        r = conv1d(b["res_conv2"], r)
        x = x + r
        new_blocks.append({"trans": t_cache, "res": rc})
    x = jax.nn.elu(x)
    wav, head_cache = _causal_conv(params["head"], x, cfg.last_kernel_size - 1,
                                   None if own_cache else cache["head"])

    if own_cache:
        return wav, None
    new_cache = {
        "pos": tr_cache["pos"], "attn_len": tr_cache["attn_len"],
        "attn_k": tr_cache["attn_k"], "attn_v": tr_cache["attn_v"],
        "up_trans": up_cache, "dec_conv0": c0, "blocks": new_blocks,
        "head": head_cache,
    }
    return wav, new_cache
