"""Rotary position embeddings, including Llama-3.1 frequency scaling.

Replaces flashinfer.apply_rope_pos_ids (reference flashinfer_utils.py:270-324).
Uses the "split-half" rotation convention (HF Llama/Qwen): the head dim is
split into two halves rotated against each other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    llama31_scaling: bool = False,
    scale_factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    old_context_len: int = 8192,
) -> jax.Array:
    """Per-pair inverse frequencies, shape (head_dim // 2,), float32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if llama31_scaling:
        low_wavelen = old_context_len / low_freq_factor
        high_wavelen = old_context_len / high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (old_context_len / wavelen - low_freq_factor) / (
            high_freq_factor - low_freq_factor
        )
        scaled = jnp.where(
            wavelen > low_wavelen,
            inv_freq / scale_factor,
            jnp.where(
                wavelen < high_wavelen,
                inv_freq,
                (1.0 - smooth) * inv_freq / scale_factor + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    return inv_freq


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    positions: jax.Array,
    inv_freq: jax.Array,
    rope_dim: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Rotate q and k by position.

    q: (T, H, D); k: (T, KH, D); positions: (T,) int32.
    rope_dim: if set (< D), only the first rope_dim dims are rotated
    (partial-rotary models); the rest pass through.
    """

    def rot(x: jax.Array) -> jax.Array:
        D = x.shape[-1]
        rd = rope_dim if rope_dim is not None else D
        xr, xp = x[..., :rd], x[..., rd:]
        angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :rd // 2]
        cos = jnp.cos(angles)[:, None, :]  # (T, 1, rd/2)
        sin = jnp.sin(angles)[:, None, :]
        x1, x2 = xr[..., : rd // 2], xr[..., rd // 2:]
        xf1 = x1.astype(jnp.float32)
        xf2 = x2.astype(jnp.float32)
        r1 = xf1 * cos - xf2 * sin
        r2 = xf2 * cos + xf1 * sin
        out = jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
        if rd < D:
            out = jnp.concatenate([out, xp], axis=-1)
        return out

    return rot(q), rot(k)


def apply_rope_interleaved(
    q: jax.Array,
    k: jax.Array,
    positions: jax.Array,
    inv_freq: jax.Array,
    rope_dim: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Interleaved variant (pairs (2i, 2i+1) rotated together): GPT-NeoX
    convention, and — with rope_dim < D — ChatGLM's partial rotary as used
    by GLM-4-Voice (reference model/glm_voice.py:148-155 passes
    interleave=True, rotary_dim=head_dim//2 to flashinfer). Dims beyond
    rope_dim pass through unrotated."""

    def rot(x: jax.Array) -> jax.Array:
        T, H, D = x.shape
        rd = rope_dim if rope_dim is not None else D
        xr, xp = x[..., :rd], x[..., rd:]
        angles = (positions[:, None].astype(jnp.float32)
                  * inv_freq[None, :rd // 2])
        cos = jnp.cos(angles)[:, None, :]
        sin = jnp.sin(angles)[:, None, :]
        xf = xr.astype(jnp.float32).reshape(T, H, rd // 2, 2)
        x1, x2 = xf[..., 0], xf[..., 1]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.stack([r1, r2], axis=-1).reshape(T, H, rd).astype(x.dtype)
        if rd < D:
            out = jnp.concatenate([out, xp], axis=-1)
        return out

    return rot(q), rot(k)
