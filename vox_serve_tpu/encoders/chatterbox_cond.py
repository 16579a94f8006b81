"""Chatterbox T3 conditioning encoder, weight-exact.

Faithful JAX port of the reference ``ChatterboxCondEnc`` + perceiver
(encoder/chatterbox.py:143-311): a shared AttentionBlock2 (LayerNorm on
both operands, separate q/k/v, residual projection) applied twice —
cross-attention of 32 learned query tokens over the prompt speech
embeddings, then self-attention — plus the speaker-embedding projection
(256 -> 1024) and the bias-free emotion linear. Row order matches the
reference: [speaker, prompt x 32, emotion].

Weights live inside t3_cfg.safetensors under ``cond_enc.*``; the default
conditionals (speaker emb + 150 prompt speech tokens + exaggeration 0.5)
ship as ``conds.pt`` (reference model/chatterbox.py:443-446).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

N_QUERY = 32
QUERY_DIM = 1024
HEADS = 4


def load_chatterbox_cond_params(sd: dict, prefix: str = "cond_enc.") -> dict:
    def arr(n):
        return jnp.asarray(np.asarray(sd[prefix + n]), jnp.float32)

    p = {
        "spkr_w": arr("spkr_enc.weight"), "spkr_b": arr("spkr_enc.bias"),
        "emotion_w": arr("emotion_adv_fc.weight"),
        "query": arr("perceiver.pre_attention_query"),
        "norm_w": arr("perceiver.attn.norm.weight"),
        "norm_b": arr("perceiver.attn.norm.bias"),
    }
    for n in ("to_q", "to_k", "to_v", "proj_out"):
        p[n] = {"w": arr(f"perceiver.attn.{n}.weight"),
                "b": arr(f"perceiver.attn.{n}.bias")}
    return p


def init_chatterbox_cond_params(key: jax.Array, channels: int = QUERY_DIM,
                                spk_dim: int = 256) -> dict:
    ks = iter(jax.random.split(key, 16))

    def lin(cin, cout):
        return {"w": jax.random.normal(next(ks), (cout, cin)) * 0.05,
                "b": jnp.zeros((cout,))}

    return {
        "spkr_w": jax.random.normal(next(ks), (channels, spk_dim)) * 0.05,
        "spkr_b": jnp.zeros((channels,)),
        "emotion_w": jax.random.normal(next(ks), (channels, 1)) * 0.05,
        "query": jax.random.normal(next(ks), (1, N_QUERY, channels)) * 0.1,
        "norm_w": jnp.ones((channels,)), "norm_b": jnp.zeros((channels,)),
        "to_q": lin(channels, channels), "to_k": lin(channels, channels),
        "to_v": lin(channels, channels), "proj_out": lin(channels, channels),
    }


def _lin(p, x):
    return x @ p["w"].T + p["b"]


def _attn_block(p, x1, x2):
    """AttentionBlock2 (encoder/chatterbox.py:143-207): residual
    x1 + proj(MHA(q(norm x1), k(norm x2), v(norm x2)))."""
    def norm(x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * p["norm_w"] + p["norm_b"]

    B, T1, C = x1.shape
    hd = C // HEADS
    q = _lin(p["to_q"], norm(x1)).reshape(B, T1, HEADS, hd)
    k = _lin(p["to_k"], norm(x2)).reshape(B, -1, HEADS, hd)
    v = _lin(p["to_v"], norm(x2)).reshape(B, -1, HEADS, hd)
    s = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
        jnp.asarray(hd, jnp.float32))
    a = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, -1), v)
    return x1 + _lin(p["proj_out"], a.reshape(B, T1, C))


def chatterbox_perceiver(params: dict, h: jax.Array) -> jax.Array:
    """(B, T, C) prompt speech embeddings -> (B, 32, C) resampled latents
    (cross-attention with learned queries, then self-attention)."""
    query = jnp.broadcast_to(params["query"],
                             (h.shape[0],) + params["query"].shape[1:])
    pre = _attn_block(params, query, h)
    return _attn_block(params, pre, pre)


def chatterbox_cond_encode(params: dict, speaker_emb: jax.Array,
                           prompt_speech_emb: jax.Array | None,
                           emotion_adv: float | jax.Array) -> jax.Array:
    """-> (1 + 32 + 1, C) conditioning rows in reference order
    (encoder/chatterbox.py:278-310)."""
    spkr = (speaker_emb.reshape(1, -1) @ params["spkr_w"].T
            + params["spkr_b"])  # (1, C)
    rows = [spkr]
    if prompt_speech_emb is not None:
        rows.append(chatterbox_perceiver(params,
                                         prompt_speech_emb[None])[0])
    emo = jnp.asarray(emotion_adv, jnp.float32).reshape(1, 1)
    rows.append(emo @ params["emotion_w"].T)
    return jnp.concatenate(rows, axis=0)
