"""Step-Audio-2 flow-matching token->mel decoder (DiT estimator), weight-exact.

Faithful JAX re-implementation of the reference StepAudio2Decoder flow
(tokenizer/step_audio_2.py:1804-1900): UpsampleConformerEncoderV2 — the
SAME architecture and weight names as CosyVoice's upsample conformer
(machinery reused from codecs/cosyvoice_flow.py) with real-lookahead context
handling — feeding a CausalConditionalCFM whose estimator is a 16-block
adaLN-Zero **DiT** (attention with per-head qk LayerNorms + causal conv block
+ tanh-GELU MLP, step_audio_2.py:245-721) solved with the 10-step cosine
Euler CFG schedule.

``load_step_flow_params`` walks token2wav/flow.pt mechanically; golden parity
vs the reference torch modules in tests/test_step_dit_parity.py.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import linear
from ..ops.norms import layer_norm
from .cosyvoice_flow import (CosyFlowConfig, _encoder_forward, _lin, _mish,
                             init_cosy_flow, load_cosy_encoder_section)
from .layers import conv1d, init_conv1d


@dataclasses.dataclass(frozen=True)
class StepFlowConfig:
    input_size: int = 512
    output_size: int = 512
    heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    up_blocks: int = 4
    vocab_size: int = 6561
    spk_dim: int = 192
    mel_dim: int = 80
    token_mel_ratio: int = 2
    pre_lookahead: int = 3
    # DiT estimator (step_audio_2.py:1860-1869)
    dit_depth: int = 16
    dit_hidden: int = 512
    dit_heads: int = 8
    dit_head_dim: int = 64
    dit_mlp_ratio: float = 4.0
    n_timesteps: int = 10
    cfg_rate: float = 0.7

    @property
    def upsample(self) -> int:
        return self.token_mel_ratio

    @property
    def est_in(self) -> int:
        return self.mel_dim * 4

    def encoder_cfg(self) -> CosyFlowConfig:
        return CosyFlowConfig(
            input_size=self.input_size, output_size=self.output_size,
            heads=self.heads, linear_units=self.linear_units,
            num_blocks=self.num_blocks, up_blocks=self.up_blocks,
            vocab_size=self.vocab_size, spk_dim=self.spk_dim,
            mel_dim=self.mel_dim, pre_lookahead=self.pre_lookahead)


# ---------------------------------------------------------------------------
# init / load
# ---------------------------------------------------------------------------


def init_step_flow(cfg: StepFlowConfig, key: jax.Array) -> dict:
    k_enc, k_dit = jax.random.split(key)
    base = init_cosy_flow(cfg.encoder_cfg(), k_enc)
    keys = iter(jax.random.split(k_dit, 1024))

    def nk():
        return next(keys)

    hs = cfg.dit_hidden
    hd = cfg.dit_head_dim
    inner = cfg.dit_heads * hd
    mlp_h = int(hs * cfg.dit_mlp_ratio)

    def dit_block():
        return {
            "attn": {
                "to_q": _lin(nk(), hs, inner, bias=True),
                "to_k": _lin(nk(), hs, inner, bias=True),
                "to_v": _lin(nk(), hs, inner, bias=True),
                "q_norm": {"w": jnp.ones((hd,)), "b": jnp.zeros((hd,))},
                "k_norm": {"w": jnp.ones((hd,)), "b": jnp.zeros((hd,))},
                "proj": _lin(nk(), inner, hs, bias=True),
            },
            "mlp": {"fc1": _lin(nk(), hs, mlp_h, bias=True),
                    "fc2": _lin(nk(), mlp_h, hs, bias=True)},
            "conv": {"conv1": init_conv1d(nk(), hs, hs, 3),
                     "norm": {"w": jnp.ones((hs,)), "b": jnp.zeros((hs,))},
                     "conv2": init_conv1d(nk(), hs, hs, 3)},
            "adaln": _lin(nk(), hs, 9 * hs, bias=True),
        }

    est = {
        "t_mlp1": _lin(nk(), 256, hs, bias=True),
        "t_mlp2": _lin(nk(), hs, hs, bias=True),
        "in_proj": _lin(nk(), cfg.est_in, hs, bias=True),
        "blocks": [dit_block() for _ in range(cfg.dit_depth)],
        "final_adaln": _lin(nk(), hs, 2 * hs, bias=True),
        "final_linear": _lin(nk(), hs, cfg.mel_dim, bias=True),
    }
    return {
        "input_embedding": base["input_embedding"],
        "spk_embed_affine_layer": base["spk_embed_affine_layer"],
        "encoder": base["encoder"],
        "encoder_proj": base["encoder_proj"],
        "estimator": est,
    }


def load_step_flow_params(sd: dict, cfg: StepFlowConfig,
                          prefix: str = "") -> dict:
    """Map token2wav/flow.pt (Step's CausalMaskedDiffWithXvec.state_dict)
    onto the JAX pytree. Encoder keys are identical to CosyVoice's upsample
    conformer; the DiT estimator lives under decoder.estimator.*"""
    base = load_cosy_encoder_section(sd, cfg.encoder_cfg(), prefix=prefix)

    def arr(name):
        return jnp.asarray(np.asarray(sd[prefix + name]), jnp.float32)

    def lin(name, bias=True):
        p = {"w": arr(f"{name}.weight").T}
        if bias and prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    def conv(name):
        p = {"w": arr(f"{name}.weight")}
        if prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    def ln(name):
        return {"w": arr(f"{name}.weight"), "b": arr(f"{name}.bias")}

    e = "decoder.estimator"
    blocks = []
    for i in range(cfg.dit_depth):
        pre = f"{e}.blocks.{i}"
        blocks.append({
            "attn": {
                "to_q": lin(f"{pre}.attn.to_q"),
                "to_k": lin(f"{pre}.attn.to_k"),
                "to_v": lin(f"{pre}.attn.to_v"),
                "q_norm": ln(f"{pre}.attn.q_norm"),
                "k_norm": ln(f"{pre}.attn.k_norm"),
                "proj": lin(f"{pre}.attn.proj"),
            },
            "mlp": {"fc1": lin(f"{pre}.mlp.fc1"),
                    "fc2": lin(f"{pre}.mlp.fc2")},
            "conv": {"conv1": conv(f"{pre}.conv.block.1"),
                     "norm": ln(f"{pre}.conv.block.3"),
                     "conv2": conv(f"{pre}.conv.block.6")},
            "adaln": lin(f"{pre}.adaLN_modulation.1"),
        })
    est = {
        "t_mlp1": lin(f"{e}.t_embedder.mlp.0"),
        "t_mlp2": lin(f"{e}.t_embedder.mlp.2"),
        "in_proj": lin(f"{e}.in_proj"),
        "blocks": blocks,
        "final_adaln": lin(f"{e}.final_layer.adaLN_modulation.1"),
        "final_linear": lin(f"{e}.final_layer.linear"),
    }
    return {
        "input_embedding": base["input_embedding"],
        "spk_embed_affine_layer": base["spk_embed_affine_layer"],
        "encoder": base["encoder"],
        "encoder_proj": base["encoder_proj"],
        "estimator": est,
    }


# ---------------------------------------------------------------------------
# DiT estimator
# ---------------------------------------------------------------------------


def _dit_attention(p, cfg: StepFlowConfig, x):
    """DiTAttention (step_audio_2.py:276-382): qkv bias, per-head qk
    LayerNorms, full bidirectional SDPA."""
    B, T, _ = x.shape
    H, hd = cfg.dit_heads, cfg.dit_head_dim
    q = linear(p["to_q"], x).reshape(B, T, H, hd)
    k = linear(p["to_k"], x).reshape(B, T, H, hd)
    v = linear(p["to_v"], x).reshape(B, T, H, hd)
    q = layer_norm(q, p["q_norm"]["w"], p["q_norm"]["b"], eps=1e-5)
    k = layer_norm(k, p["k_norm"]["w"], p["k_norm"]["b"], eps=1e-5)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * hd)
    return linear(p["proj"], out)


def _plain_ln(x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _dit_conv_block(p, x):
    """[causal conv3, LayerNorm, Mish, causal conv3] on (B, T, C)."""
    xt = x.transpose(0, 2, 1)
    y = conv1d(p["conv1"], jnp.pad(xt, ((0, 0), (0, 0), (2, 0))))
    y = layer_norm(y.transpose(0, 2, 1), p["norm"]["w"], p["norm"]["b"],
                   eps=1e-5)
    y = _mish(y)
    y = conv1d(p["conv2"], jnp.pad(y.transpose(0, 2, 1),
                                   ((0, 0), (0, 0), (2, 0))))
    return y.transpose(0, 2, 1)


def _dit_forward(est: dict, cfg: StepFlowConfig, x, mu, t_scalar, spks, cond):
    """DiT.forward_chunk without caches (full window attention).
    x/mu/cond (B, 80, T); spks (B, 80); t (B,) -> (B, 80, T)."""
    B, _, T = x.shape
    # DiTTimestepEmbedder: [cos, sin] order, freq dim 256, scale 1000
    half = 128
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    args = (1000.0 * t_scalar)[:, None] * freqs[None]
    te = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    c = linear(est["t_mlp2"], jax.nn.silu(linear(est["t_mlp1"], te)))
    c = c[:, None, :]                                         # (B, 1, hs)

    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, :, None], (B, spks.shape[1], T)),
         cond], axis=1)                                       # (B, 320, T)
    h = linear(est["in_proj"], h.transpose(0, 2, 1))          # (B, T, hs)

    for bp in est["blocks"]:
        mods = jnp.split(jax.nn.silu(c) @ bp["adaln"]["w"]
                         + bp["adaln"]["b"], 9, axis=-1)
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp,
         sh_conv, sc_conv, g_conv) = mods
        h = h + g_msa * _dit_attention(
            bp["attn"], cfg, _plain_ln(h) * (1 + sc_msa) + sh_msa)
        h = h + g_conv * _dit_conv_block(
            bp["conv"], _plain_ln(h) * (1 + sc_conv) + sh_conv)
        mlp_in = _plain_ln(h) * (1 + sc_mlp) + sh_mlp
        h = h + g_mlp * linear(
            bp["mlp"]["fc2"],
            jax.nn.gelu(linear(bp["mlp"]["fc1"], mlp_in), approximate=True))

    sh, sc = jnp.split(jax.nn.silu(c) @ est["final_adaln"]["w"]
                       + est["final_adaln"]["b"], 2, axis=-1)
    h = _plain_ln(h) * (1 + sc) + sh
    out = linear(est["final_linear"], h)                      # (B, T, 80)
    return out.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def step_flow_forward(params: dict, cfg: StepFlowConfig, tokens: jax.Array,
                      valid: jax.Array, spk: jax.Array, conds: jax.Array,
                      rng: jax.Array, context: int = 0,
                      noise: jax.Array | None = None) -> jax.Array:
    """tokens (B, T) -> mel (B, 80, 2*(T-context)). Step's
    CausalMaskedDiffWithXvec.inference_chunk with full-window attention
    (stateless per window; the last `context` tokens feed the pre-lookahead
    conv only, step_audio_2.py:1732-1804)."""
    B, T = tokens.shape
    spk_n = spk / jnp.maximum(jnp.linalg.norm(spk, axis=1, keepdims=True),
                              1e-12)
    spk_e = linear(params["spk_embed_affine_layer"], spk_n)

    emb = jnp.take(params["input_embedding"],
                   jnp.clip(tokens, 0, cfg.vocab_size - 1), axis=0)
    emb = emb * valid[:, :, None]
    h = _encoder_forward(params, cfg.encoder_cfg(), emb, valid,
                         streaming=False, context=context)
    mu = linear(params["encoder_proj"], h).transpose(0, 2, 1)

    T2 = mu.shape[-1]
    cond = conds.transpose(0, 2, 1).astype(mu.dtype)[:, :, :T2]

    if noise is None:
        noise = jax.random.normal(rng, (1, cfg.mel_dim, T2)).astype(mu.dtype)
    x = jnp.broadcast_to(noise, (B, cfg.mel_dim, T2))

    ts = jnp.linspace(0.0, 1.0, cfg.n_timesteps + 1)
    ts = 1.0 - jnp.cos(ts * 0.5 * jnp.pi)
    est = params["estimator"]
    zeros_mu = jnp.zeros_like(mu)
    zeros_spk = jnp.zeros_like(spk_e)
    zeros_cond = jnp.zeros_like(cond)
    for step in range(1, cfg.n_timesteps + 1):
        t = ts[step - 1]
        dt = ts[step] - ts[step - 1]
        x_in = jnp.concatenate([x, x], axis=0)
        mu_in = jnp.concatenate([mu, zeros_mu], axis=0)
        spk_in = jnp.concatenate([spk_e, zeros_spk], axis=0)
        cond_in = jnp.concatenate([cond, zeros_cond], axis=0)
        t_in = jnp.full((2 * B,), t, mu.dtype)
        dphi = _dit_forward(est, cfg, x_in, mu_in, t_in, spk_in, cond_in)
        cond_d, uncond_d = dphi[:B], dphi[B:]
        dphi = (1.0 + cfg.cfg_rate) * cond_d - cfg.cfg_rate * uncond_d
        x = x + dt * dphi
    return x
