"""Sharded training step — used by the multichip dry-run and as the basis for
any on-TPU finetuning of served models.

Mesh axes: 'dp' shards the batch; 'tp' shards attention heads / FFN features
(see sharding.py). The step is a plain jitted function over NamedSharding'd
params: forward (teacher-forced, dense causal attention), token
cross-entropy, grad, SGD update. GSPMD inserts the psum for dp-gradient
reduction and the per-layer tp all-reduces.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.backbone import BackboneConfig, init_backbone_params, linear
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies
from .sharding import backbone_param_shardings


def dense_causal_forward(params: dict, cfg: BackboneConfig,
                         x: jax.Array) -> jax.Array:
    """Teacher-forced forward over (B, T, H) without paging (training path)."""
    B, T, _ = x.shape
    hd = cfg.resolved_head_dim
    H, KH = cfg.num_heads, cfg.num_kv_heads
    inv_freq = rope_frequencies(cfg.rope_dim or hd, theta=cfg.rope_theta)
    positions = jnp.arange(T, dtype=jnp.int32)
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))

    def layer_fn(h, lp):
        xin = rms_norm(h, lp["input_norm"], cfg.rms_eps)
        q = linear(lp["attn"]["q"], xin).reshape(B, T, H, hd)
        k = linear(lp["attn"]["k"], xin).reshape(B, T, KH, hd)
        v = linear(lp["attn"]["v"], xin).reshape(B, T, KH, hd)
        if cfg.qk_norm:
            q = rms_norm(q, lp["attn"]["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["attn"]["k_norm"], cfg.rms_eps)
        q, k = jax.vmap(
            lambda qq, kk: apply_rope(qq, kk, positions, inv_freq)
        )(q, k)
        k = jnp.repeat(k, H // KH, axis=2)
        v = jnp.repeat(v, H // KH, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
        scores = jnp.where(mask[None, None], scores.astype(jnp.float32),
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, H * hd)
        h = h + linear(lp["attn"]["o"], attn)
        xin2 = rms_norm(h, lp["post_norm"], cfg.rms_eps)
        gated = jax.nn.silu(linear(lp["mlp"]["gate"], xin2)) * linear(
            lp["mlp"]["up"], xin2)
        h = h + linear(lp["mlp"]["down"], gated)
        return h, None

    h, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return rms_norm(h, params["final_norm"], cfg.rms_eps)


def make_train_step(mesh: Mesh, cfg: BackboneConfig, lr: float = 1e-3):
    """Returns (train_step, init_state) where train_step is jitted over the
    mesh with dp-sharded batch and tp-sharded params."""

    def init_state(key):
        params = init_backbone_params(cfg, key)
        params["embed"] = (jax.random.normal(
            jax.random.fold_in(key, 1), (cfg.vocab_size, cfg.hidden_size)
        ) * 0.02).astype(cfg.dtype)
        params["head"] = (jax.random.normal(
            jax.random.fold_in(key, 2), (cfg.hidden_size, cfg.vocab_size)
        ) * 0.02).astype(cfg.dtype)
        return params

    param_shardings = None

    def state_shardings(params):
        nonlocal param_shardings
        s = backbone_param_shardings(mesh, params)
        s["embed"] = NamedSharding(mesh, P("tp", None))
        s["head"] = NamedSharding(mesh, P(None, "tp"))
        param_shardings = s
        return s

    data_sharding = NamedSharding(mesh, P("dp", None))

    def loss_fn(params, tokens, targets):
        x = jnp.take(params["embed"], tokens, axis=0)
        h = dense_causal_forward(params, cfg, x)
        logits = (h @ params["head"]).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
        return jnp.mean(nll)

    def train_step(params, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets)
        params = jax.tree.map(
            lambda p, g: (p.astype(jnp.float32) - lr * g).astype(p.dtype),
            params, grads)
        return params, loss

    def jitted(params, tokens, targets):
        ps = state_shardings(params)
        step = jax.jit(
            train_step,
            in_shardings=(ps, data_sharding, data_sharding),
            out_shardings=(ps, NamedSharding(mesh, P())),
        )
        return step(params, tokens, targets)

    return jitted, init_state, state_shardings, data_sharding
