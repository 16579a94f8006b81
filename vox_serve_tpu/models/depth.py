"""Depth ("code predictor" / MTP) transformer over codebooks.

Used by CSM-1B and Qwen3-TTS. TPU-first design: the whole per-step codebook
loop — depth prefill over [backbone_hidden; embed(cb0)] then one tiny decode
per codebook with per-iteration head/embedding selection — runs as a single
``jax.lax.scan`` INSIDE the jitted LM step. The reference replays one CUDA
graph per codebook per decode step (worker/cuda_graph_worker.py:1058-1160,
16 sequential launches for Qwen3); here it is one fused executable with zero
dispatch overhead between codebooks. KV is a dense (L, B, max_seq, KH, D)
array — max_seq = n_codebooks + 1 makes paging pointless.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..models.backbone import linear, _init_linear
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class DepthConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    max_seq: int            # n_codebooks + 1
    rms_eps: float = 1e-6
    qk_norm: bool = False
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.bfloat16


def init_depth_params(cfg: DepthConfig, key: jax.Array) -> dict:
    L = cfg.num_layers
    hd = cfg.head_dim
    keys = jax.random.split(key, 4)

    def stack_init(fn, k):
        return jax.vmap(fn)(jax.random.split(k, L))

    def layer_attn(k):
        ks = jax.random.split(k, 4)
        p = {
            "q": _init_linear(ks[0], cfg.hidden_size, cfg.num_heads * hd, cfg.dtype),
            "k": _init_linear(ks[1], cfg.hidden_size, cfg.num_kv_heads * hd, cfg.dtype),
            "v": _init_linear(ks[2], cfg.hidden_size, cfg.num_kv_heads * hd, cfg.dtype),
            "o": _init_linear(ks[3], cfg.num_heads * hd, cfg.hidden_size, cfg.dtype),
        }
        if cfg.qk_norm:
            p["q_norm"] = jnp.ones((hd,), dtype=cfg.dtype)
            p["k_norm"] = jnp.ones((hd,), dtype=cfg.dtype)
        return p

    def layer_mlp(k):
        ks = jax.random.split(k, 3)
        return {
            "gate": _init_linear(ks[0], cfg.hidden_size, cfg.intermediate_size, cfg.dtype),
            "up": _init_linear(ks[1], cfg.hidden_size, cfg.intermediate_size, cfg.dtype),
            "down": _init_linear(ks[2], cfg.intermediate_size, cfg.hidden_size, cfg.dtype),
        }

    return {
        "layers": {
            "attn": stack_init(layer_attn, keys[0]),
            "mlp": stack_init(layer_mlp, keys[1]),
            "input_norm": jnp.ones((L, cfg.hidden_size), dtype=cfg.dtype),
            "post_norm": jnp.ones((L, cfg.hidden_size), dtype=cfg.dtype),
        },
        "final_norm": jnp.ones((cfg.hidden_size,), dtype=cfg.dtype),
    }


def init_depth_kv(cfg: DepthConfig, batch: int) -> tuple[jax.Array, jax.Array]:
    shape = (cfg.num_layers, batch, cfg.max_seq, cfg.num_kv_heads, cfg.head_dim)
    return (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))


def depth_forward(
    params: dict,
    cfg: DepthConfig,
    x: jax.Array,            # (B, t, hidden) new tokens
    start_pos,               # int or traced scalar: position of x[:, 0]
    k_cache: jax.Array,
    v_cache: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Process t new tokens; returns (last hidden (B, hidden), caches)."""
    B, t, _ = x.shape
    hd, H, KH = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    S = cfg.max_seq
    inv_freq = rope_frequencies(hd, theta=cfg.rope_theta)
    positions = start_pos + jnp.arange(t, dtype=jnp.int32)  # (t,)

    # causal-over-cache mask: new token j (global pos start+j) sees cache
    # positions <= start+j
    cache_pos = jnp.arange(S, dtype=jnp.int32)
    mask = cache_pos[None, :] <= positions[:, None]  # (t, S)

    def layer_fn(carry, scanned):
        h, kc, vc = carry
        lp, layer_idx = scanned
        xin = rms_norm(h, lp["input_norm"], cfg.rms_eps)
        xin2d = xin.reshape(B * t, -1)
        q = linear(lp["attn"]["q"], xin2d).reshape(B, t, H, hd)
        k = linear(lp["attn"]["k"], xin2d).reshape(B, t, KH, hd)
        v = linear(lp["attn"]["v"], xin2d).reshape(B, t, KH, hd)
        if cfg.qk_norm:
            q = rms_norm(q, lp["attn"]["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["attn"]["k_norm"], cfg.rms_eps)
        # rope over flattened (B*t)
        qf = q.reshape(B * t, H, hd)
        kf = k.reshape(B * t, KH, hd)
        pos_bt = jnp.tile(positions, (B,))
        qf, kf = apply_rope(qf, kf, pos_bt, inv_freq)
        q = qf.reshape(B, t, H, hd)
        k = kf.reshape(B, t, KH, hd)

        # write new K/V into the cache at [start : start+t]
        kc = kc.at[layer_idx].set(
            jax.lax.dynamic_update_slice(
                kc[layer_idx], k.astype(kc.dtype), (0, start_pos, 0, 0)))
        vc = vc.at[layer_idx].set(
            jax.lax.dynamic_update_slice(
                vc[layer_idx], v.astype(vc.dtype), (0, start_pos, 0, 0)))

        k_all = kc[layer_idx].astype(jnp.float32)  # (B, S, KH, D)
        v_all = vc[layer_idx].astype(jnp.float32)
        rep = H // KH
        k_all = jnp.repeat(k_all, rep, axis=2)
        v_all = jnp.repeat(v_all, rep, axis=2)
        scale = 1.0 / math.sqrt(hd)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32) * scale,
                            k_all)
        scores = jnp.where(mask[None, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v_all)
        attn = attn.reshape(B * t, H * hd).astype(h.dtype)
        h = h + linear(lp["attn"]["o"], attn).reshape(B, t, -1)

        xin3 = rms_norm(h, lp["post_norm"], cfg.rms_eps)
        x2 = xin3.reshape(B * t, -1)
        gated = jax.nn.silu(linear(lp["mlp"]["gate"], x2)) * linear(
            lp["mlp"]["up"], x2)
        h = h + linear(lp["mlp"]["down"], gated).reshape(B, t, -1)
        return (h, kc, vc), None

    L = cfg.num_layers
    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x[:, -1], k_cache, v_cache
