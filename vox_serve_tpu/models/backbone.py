"""Config-driven decoder-only transformer backbone.

TPU-first consolidation: the reference hand-writes one FlashInfer-native
backbone per family (orpheus.py:15-222, csm.py, zonos.py:76-126,
glm_voice.py:65-305, cosyvoice2.py:86-317, qwen3_tts.py, chatterbox.py:299-400,
step_audio_2.py:222-243) — all Llama/Qwen-style decoders differing only in
dims, biases, qk-norm, RoPE flavor and position-embedding type. Here there is
exactly ONE implementation, parameterized by ``BackboneConfig``:

  * layers are **stacked** into a single pytree with a leading layer axis and
    executed with ``jax.lax.scan`` — one compiled layer body regardless of
    depth (compile time stays flat across 0.5B..9B models);
  * K/V page pools ride the scan carry, written in place per layer via
    dynamic indexing;
  * everything is shape-static; prefill/decode is a trace-time flag on the
    AttnMetadata.

Tensor-parallel sharding rules for these params live in parallel/sharding.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import (
    AttnMetadata,
    paged_attention_decode,
    ragged_prefill_attention,
    write_kv_prefill,
)
from ..ops.norms import rms_norm
from ..ops.rope import (apply_rope, apply_rope_interleaved,
                        rope_frequencies)


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    intermediate_size: int
    head_dim: Optional[int] = None  # default hidden_size // num_heads
    rope_theta: float = 10000.0
    rope_dim: Optional[int] = None  # partial rotary if < head_dim
    #: ChatGLM convention: rotate interleaved pairs (2i, 2i+1) instead of
    #: split halves (GLM-4-Voice; reference glm_voice.py:153 interleave=True)
    rope_interleaved: bool = False
    llama31_rope_scaling: bool = False
    rms_eps: float = 1e-6
    qkv_bias: bool = False  # Qwen2-style
    o_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False  # Qwen3-style per-head RMSNorm on q/k
    use_layer_norm: bool = False  # Zonos: LayerNorm (with bias) instead of RMSNorm
    max_position_embeddings: int = 8192
    attn_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or (self.hidden_size // self.num_heads)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, dtype, bias=False):
    w = jax.random.normal(key, (d_in, d_out), dtype=jnp.float32) * (d_in ** -0.5)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype=dtype)
    return p


def linear(p, x):
    if "w_q" in p:
        # int8 weight-only quantization: weights stream from HBM at one
        # byte/element and convert to the compute dtype inside the matmul
        # fusion (weight-bound decode families — Orpheus-3B runs ~6x off
        # its weight-streaming roofline at bf16, artifacts/orpheus_bench_r4)
        y = (x @ p["w_q"].astype(x.dtype)) * p["w_s"].astype(x.dtype)
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def quantize_linear_params(p: dict) -> dict:
    """Symmetric per-output-channel int8 quantization of a linear leaf
    {"w": (..., d_in, d_out)} -> {"w_q": int8, "w_s": f32 (..., d_out)}.
    Works on stacked (L, d_in, d_out) layer params too."""
    w = p["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": q, "w_s": s}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_backbone_params(params: dict) -> dict:
    """int8-quantize every matmul weight in the backbone pytree (q/k/v/o,
    gate/up/down); norms and biases stay full precision. The result feeds
    the same `backbone_forward` — `linear` dispatches on the leaf keys."""
    out = {k: v for k, v in params.items()}
    layers = {k: v for k, v in params["layers"].items()}
    layers["attn"] = {
        k: (quantize_linear_params(v) if k in ("q", "k", "v", "o") else v)
        for k, v in params["layers"]["attn"].items()}
    layers["mlp"] = {k: quantize_linear_params(v)
                     for k, v in params["layers"]["mlp"].items()}
    out["layers"] = layers
    return out


def init_backbone_params(cfg: BackboneConfig, key: jax.Array) -> dict:
    """Random-init stacked params (layer axis leading). Real checkpoints are
    loaded by weights.py into the same structure."""
    hd = cfg.resolved_head_dim
    L = cfg.num_layers
    keys = jax.random.split(key, 8)

    def stack_init(fn, k):
        ks = jax.random.split(k, L)
        return jax.vmap(fn)(ks)

    def layer_attn(k):
        ks = jax.random.split(k, 4)
        p = {
            "q": _init_linear(ks[0], cfg.hidden_size, cfg.num_heads * hd, cfg.dtype, cfg.qkv_bias),
            "k": _init_linear(ks[1], cfg.hidden_size, cfg.num_kv_heads * hd, cfg.dtype, cfg.qkv_bias),
            "v": _init_linear(ks[2], cfg.hidden_size, cfg.num_kv_heads * hd, cfg.dtype, cfg.qkv_bias),
            "o": _init_linear(ks[3], cfg.num_heads * hd, cfg.hidden_size, cfg.dtype, cfg.o_bias),
        }
        if cfg.qk_norm:
            p["q_norm"] = jnp.ones((hd,), dtype=cfg.dtype)
            p["k_norm"] = jnp.ones((hd,), dtype=cfg.dtype)
        return p

    def layer_mlp(k):
        ks = jax.random.split(k, 3)
        return {
            "gate": _init_linear(ks[0], cfg.hidden_size, cfg.intermediate_size, cfg.dtype, cfg.mlp_bias),
            "up": _init_linear(ks[1], cfg.hidden_size, cfg.intermediate_size, cfg.dtype, cfg.mlp_bias),
            "down": _init_linear(ks[2], cfg.intermediate_size, cfg.hidden_size, cfg.dtype, cfg.mlp_bias),
        }

    params = {
        "layers": {
            "attn": stack_init(layer_attn, keys[0]),
            "mlp": stack_init(layer_mlp, keys[1]),
            "input_norm": jnp.ones((L, cfg.hidden_size), dtype=cfg.dtype),
            "post_norm": jnp.ones((L, cfg.hidden_size), dtype=cfg.dtype),
        },
        "final_norm": jnp.ones((cfg.hidden_size,), dtype=cfg.dtype),
    }
    if cfg.use_layer_norm:
        params["layers"]["input_norm_b"] = jnp.zeros(
            (L, cfg.hidden_size), dtype=cfg.dtype)
        params["layers"]["post_norm_b"] = jnp.zeros(
            (L, cfg.hidden_size), dtype=cfg.dtype)
        params["final_norm_b"] = jnp.zeros((cfg.hidden_size,), dtype=cfg.dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def backbone_forward(
    params: dict,
    cfg: BackboneConfig,
    x: jax.Array,
    positions: jax.Array,
    meta: AttnMetadata,
    k_pages: jax.Array,
    v_pages: jax.Array,
    use_pallas: bool = False,
    kv_scales: tuple[float, float] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Run the decoder stack.

    x: (T, hidden) token embeddings (embedding lookup / codebook sums are the
       model wrapper's job — some families sum 17 codebooks, splice audio
       features, or add conditioning prefixes).
    positions: (T,) int32 absolute positions.
    kv_scales: static dequant multipliers when the page pool is quantized
       (ops/kv_cache.py KVCacheConfig.kv_scales); None = full precision.
    Returns (hidden (T, H), k_pages, v_pages).
    """
    hd = cfg.resolved_head_dim
    H, KH = cfg.num_heads, cfg.num_kv_heads
    # (no learned-positions path here: Chatterbox handles its learned
    # absolute positions in its own embed_step before backbone_forward)
    inv_freq = rope_frequencies(
        cfg.rope_dim or hd,
        theta=cfg.rope_theta,
        llama31_scaling=cfg.llama31_rope_scaling,
    )

    T = x.shape[0]

    if cfg.use_layer_norm:
        from ..ops.norms import layer_norm as _ln

        def norm_in(h, lp):
            return _ln(h, lp["input_norm"], lp["input_norm_b"], cfg.rms_eps)

        def norm_post(h, lp):
            return _ln(h, lp["post_norm"], lp["post_norm_b"], cfg.rms_eps)
    else:
        def norm_in(h, lp):
            return rms_norm(h, lp["input_norm"], cfg.rms_eps)

        def norm_post(h, lp):
            return rms_norm(h, lp["post_norm"], cfg.rms_eps)

    def layer_fn(carry, scanned):
        h, kp, vp = carry
        lp, layer_idx = scanned

        xin = norm_in(h, lp)
        q = linear(lp["attn"]["q"], xin).reshape(T, H, hd)
        k = linear(lp["attn"]["k"], xin).reshape(T, KH, hd)
        v = linear(lp["attn"]["v"], xin).reshape(T, KH, hd)

        if cfg.qk_norm:
            q = rms_norm(q, lp["attn"]["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["attn"]["k_norm"], cfg.rms_eps)

        if inv_freq is not None:
            if cfg.rope_interleaved:
                q, k = apply_rope_interleaved(q, k, positions, inv_freq,
                                              rope_dim=cfg.rope_dim)
            else:
                q, k = apply_rope(q, k, positions, inv_freq,
                                  rope_dim=cfg.rope_dim)

        kp, vp = write_kv_prefill(kp, vp, layer_idx, k, v, meta,
                                  kv_scales=kv_scales)
        if meta.is_prefill:
            # Pallas flash prefill for large buckets (no (H, T, T) score
            # materialization, causal + ragged block skipping; sub-128 head
            # dims zero-pad to the lane width inside the call); dense XLA
            # path for small buckets / CPU
            if use_pallas and T >= 512:
                from ..ops.pallas_prefill import pallas_ragged_prefill

                attn_out = pallas_ragged_prefill(q, k, v, meta,
                                                 scale=cfg.attn_scale)
            else:
                attn_out = ragged_prefill_attention(q, k, v, meta,
                                                    scale=cfg.attn_scale)
        else:
            # pass the FULL carried pool + traced layer index: the Pallas
            # kernel resolves the layer inside its page DMAs. Slicing the
            # carried pool here materialized the (KH, P, page, D) plane as
            # a per-layer copy (~380 MB/layer for the flagship = 13 ms/step
            # measured at B=1) because the kernel consumed it as an opaque
            # ANY-space operand.
            attn_out = paged_attention_decode(
                q, kp, vp, layer_idx, meta, scale=cfg.attn_scale,
                use_pallas=use_pallas, kv_scales=kv_scales,
            )

        h = h + linear(lp["attn"]["o"], attn_out.reshape(T, H * hd))

        xin2 = norm_post(h, lp)
        gated = jax.nn.silu(linear(lp["mlp"]["gate"], xin2)) * linear(lp["mlp"]["up"], xin2)
        h = h + linear(lp["mlp"]["down"], gated)
        return (h, kp, vp), None

    L = cfg.num_layers
    import os as _os

    # unrolling lets XLA software-pipeline the next layer's weight fetch
    # with the current layer's compute (experimentally tunable)
    _unroll = int(_os.environ.get("VOX_BACKBONE_UNROLL", "1"))
    (x, k_pages, v_pages), _ = jax.lax.scan(
        layer_fn,
        (x, k_pages, v_pages),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)),
        unroll=_unroll,
    )
    if cfg.use_layer_norm:
        from ..ops.norms import layer_norm as _ln

        x = _ln(x, params["final_norm"], params["final_norm_b"], cfg.rms_eps)
    else:
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x, k_pages, v_pages
