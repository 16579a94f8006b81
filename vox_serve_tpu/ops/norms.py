"""Normalization ops. XLA fuses these into surrounding matmuls; no custom
kernel needed (replaces flashinfer.rmsnorm, reference flashinfer_utils.py:251)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm in f32 accumulation, cast back to x.dtype.

    offset=1.0 gives the Gemma-style (1 + w) parameterization some codecs use.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (weight.astype(jnp.float32) + offset)).astype(dtype)


def layer_norm(x: jax.Array, weight: jax.Array | None = None,
               bias: jax.Array | None = None, eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed.astype(dtype)
