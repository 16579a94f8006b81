"""Attention for continuous batching over the paged KV cache.

This replaces the reference's FlashInfer wrappers (flashinfer_utils.py:11-248)
with two TPU-shaped primitives, both fully shape-static so every bucketed
step compiles once:

  * ``ragged_prefill_attention`` — prompts are concatenated token-wise into a
    single ``[T_bucket]`` ragged batch with segment ids (the analogue of
    FlashInfer's qo_indptr), and attention is causal *within* each segment.
    Prefill in this system always starts from an empty KV (new requests), so
    prefill attention never reads the page pool; K/V are written to pages on
    the side for the decode phase.

  * ``paged_attention_decode`` — one query per request attends over its block
    table. The pure-JAX path below gathers pages with ``jnp.take`` (XLA turns
    this into dynamic-gathers that stream from HBM); a Pallas kernel with
    manual double-buffered DMA lives in ``pallas_attention.py`` and is
    selected via ``use_pallas=True`` once batch/KV sizes warrant it.

KV writes are scatter-by-(page, offset): the host computes int32 page ids and
in-page offsets per new token (the "plan" phase, mirroring FlashInfer's
plan/run split) and the jitted step scatters. Dead/padded batch slots are
directed at the reserved scratch page 0, so padding needs no masking
(reference's scratch-page trick, worker/cuda_graph_worker.py:857-866).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass
class AttnMetadata:
    """Per-step attention metadata (device arrays, host-planned).

    Decode (one token per request, batch B):
      block_tables: (B, max_pages) int32 — page ids per request, pad = 0
      seq_lens:     (B,) int32 — tokens in KV *including* this step's token
      kv_page_ids / kv_page_offsets: (B,) int32 — where this step's K/V goes

    Prefill (ragged, T tokens total):
      segment_ids:  (T,) int32 — request index per token; padding = -1
      q_positions:  (T,) int32 — position of each token within its segment
      kv_page_ids / kv_page_offsets: (T,) int32 — scatter targets (pad -> 0)
    """

    is_prefill: bool
    kv_page_ids: jax.Array
    kv_page_offsets: jax.Array
    # decode
    block_tables: Optional[jax.Array] = None
    seq_lens: Optional[jax.Array] = None
    # prefill
    segment_ids: Optional[jax.Array] = None
    q_positions: Optional[jax.Array] = None


def _meta_flatten(m: "AttnMetadata"):
    children = (m.kv_page_ids, m.kv_page_offsets, m.block_tables, m.seq_lens,
                m.segment_ids, m.q_positions)
    return children, m.is_prefill


def _meta_unflatten(is_prefill, children):
    kv_page_ids, kv_page_offsets, block_tables, seq_lens, segment_ids, q_positions = children
    return AttnMetadata(
        is_prefill=is_prefill,
        kv_page_ids=kv_page_ids,
        kv_page_offsets=kv_page_offsets,
        block_tables=block_tables,
        seq_lens=seq_lens,
        segment_ids=segment_ids,
        q_positions=q_positions,
    )


jax.tree_util.register_pytree_node(AttnMetadata, _meta_flatten, _meta_unflatten)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """(..., KH, D) -> (..., KH*n_rep, D) for grouped-query attention."""
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=-2)


# ---------------------------------------------------------------------------
# KV page writes
# ---------------------------------------------------------------------------


def _quantize_kv(k: jax.Array, v: jax.Array, pool_dtype,
                 kv_scales: Optional[tuple[float, float]]):
    """Quantize fresh K/V rows for a quantized pool (kv_cache.py quant):
    f8_e4m3 clips to the format's +-448 range and casts; int8 stores
    round(x / scale) clipped to +-127. No-op for full-precision pools."""
    if pool_dtype == jnp.int8:
        ks, vs = kv_scales
        k = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127, 127)
        v = jnp.clip(jnp.round(v.astype(jnp.float32) / vs), -127, 127)
        return k.astype(jnp.int8), v.astype(jnp.int8)
    if pool_dtype == jnp.float8_e4m3fn:
        k = jnp.clip(k.astype(jnp.float32), -448.0, 448.0)
        v = jnp.clip(v.astype(jnp.float32), -448.0, 448.0)
        return k.astype(pool_dtype), v.astype(pool_dtype)
    return k, v


def write_kv_prefill(
    k_pages: jax.Array,
    v_pages: Optional[jax.Array],
    layer: int,
    k: jax.Array,
    v: jax.Array,
    meta: AttnMetadata,
    kv_scales: Optional[tuple[float, float]] = None,
) -> tuple[jax.Array, Optional[jax.Array]]:
    """Scatter T new K/V rows into the page pool at a given layer.
    k, v: (T, KH, D). Padded tokens target scratch page 0.

    Legacy pair layout (v_pages an array): pools are (L, KH, P, page, D).
    The scatter batch order is KH-leading (update (KH, T, D), head index as
    the first advanced axis): with token-leading updates, XLA's layout
    assignment prefers a KH-minor pool layout and inserts a full-pool
    relayout COPY on executable entry — two multi-GB HLO temps per step for
    a flagship-sized pool (observed OOM at batch 96), plus the copy
    bandwidth. KH-leading updates match the pool's (L, KH, P, page, D)
    default layout, so the scatter lowers in place.

    Combined layout (v_pages is None): k_pages IS the single
    (L, P, page, 2KH, Ds) pool; K/V interleave on the combined-head axis
    (K even, V odd — the ragged kernel's convention) so each token's write
    is ONE contiguous (2KH, Ds) row, matching the pool's minor dims.
    Sub-128 head dims zero-pad to the pool's 128-lane store_dim
    (kv_cache.py:KVCacheConfig.store_dim).
    """
    dtype = k_pages.dtype
    if v_pages is None:
        T, KH, D = k.shape
        k, v = _quantize_kv(k, v, dtype, kv_scales)
        kv = jnp.stack([k, v], axis=2).reshape(T, 2 * KH, D)  # k0,v0,k1,v1
        Ds = k_pages.shape[-1]
        if Ds != D:
            kv = jnp.pad(kv, ((0, 0), (0, 0), (0, Ds - D)))
        pool = k_pages.at[layer, meta.kv_page_ids, meta.kv_page_offsets].set(
            kv.astype(dtype), mode="drop")
        return pool, None
    kh = jnp.arange(k_pages.shape[1], dtype=jnp.int32)[:, None]
    ids = meta.kv_page_ids[None, :]
    offs = meta.kv_page_offsets[None, :]
    k_pages = k_pages.at[layer, kh, ids, offs].set(
        k.astype(dtype).transpose(1, 0, 2), mode="drop"
    )
    v_pages = v_pages.at[layer, kh, ids, offs].set(
        v.astype(dtype).transpose(1, 0, 2), mode="drop"
    )
    return k_pages, v_pages


# decode writes share the same signature/semantics (B rows instead of T)
write_kv_decode = write_kv_prefill


# ---------------------------------------------------------------------------
# prefill: ragged causal self-attention by segment mask
# ---------------------------------------------------------------------------


def ragged_prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    meta: AttnMetadata,
    scale: float | None = None,
) -> jax.Array:
    """q: (T, H, D); k, v: (T, KH, D); returns (T, H, D) float32->q.dtype.

    Causal within segment: token i attends j iff seg[i] == seg[j] >= 0 and
    pos[i] >= pos[j]. O(T^2) dense with mask — T is the prefill bucket
    (default 1024), which is well within MXU-friendly range.
    """
    T, H, D = q.shape
    KH = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    k = _repeat_kv(k, H // KH)
    v = _repeat_kv(v, H // KH)

    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("thd,shd->hts", qf, k.astype(jnp.float32))

    seg = meta.segment_ids
    pos = meta.q_positions
    valid = (seg[:, None] == seg[None, :]) & (seg[:, None] >= 0)
    causal = pos[:, None] >= pos[None, :]
    mask = valid & causal
    scores = jnp.where(mask[None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hts,shd->thd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# decode: paged attention (pure-JAX gather path)
# ---------------------------------------------------------------------------


def _combined_decode_gather(q, pool, layer, meta, scale, kv_scales=None):
    """Pure-JAX oracle/CPU path for the combined (L, P, page, 2KH, Ds)
    pool; Ds >= D (zero-padded store lanes are sliced off). Quantized
    pools (int8/f8) dequantize here with the static kv_scales."""
    B, H, D = q.shape
    KH = pool.shape[3] // 2
    page_size = pool.shape[2]
    Ds = pool.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)

    pages = jnp.take(pool[layer], meta.block_tables, axis=0)  # (B,maxP,page,2KH,Ds)
    S = pages.shape[1] * page_size
    kv = pages.reshape(B, S, 2 * KH, Ds)
    k = kv[:, :, 0::2, :D]
    v = kv[:, :, 1::2, :D]
    if kv_scales is not None:
        k = k.astype(jnp.float32) * kv_scales[0]
        v = v.astype(jnp.float32) * kv_scales[1]
    k = _repeat_kv(k, H // KH)
    v = _repeat_kv(v, H // KH)

    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("bhd,bshd->bhs", qf, k.astype(jnp.float32))
    token_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
    mask = token_idx < meta.seq_lens[:, None]
    scores = jnp.where(mask[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhs,bshd->bhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def paged_attention_decode(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: Optional[jax.Array],
    layer: int,
    meta: AttnMetadata,
    scale: float | None = None,
    use_pallas: bool = False,
    kv_scales: Optional[tuple[float, float]] = None,
) -> jax.Array:
    """q: (B, H, D); returns (B, H, D). seq_lens already includes the current
    token, whose K/V must be written *before* calling this.

    kv_scales: (k_scale, v_scale) static dequant multipliers for a
    quantized combined pool (kv_cache.py KVCacheConfig.kv_scales) — the
    ragged kernel dequantizes in-kernel, so quantization halves both pool
    bytes and attention DMA traffic. None for full-precision pools.

    Legacy pair pools (L, KH, P, page, D) — head-major (kv_cache.py): gather
    path below, or the in-repo fold-capable Pallas kernel.

    Combined pool (v_pages is None, (L, P, page, 2KH, D)): the stock jax
    ragged_paged_attention kernel over the (L*P, page, 2KH, D) flat view,
    with the LAYER resolved by offsetting page indices (+ layer * P) — no
    layer slice of the scan-carried pool, no copy. Measured 83 -> 31 ms per
    B=144 28-layer step at seq 512, flat through seq 1024 (vs linear growth
    for the per-request fold kernel).
    """
    if v_pages is None:
        pool = k_pages
        if not use_pallas:
            return _combined_decode_gather(q, pool, layer, meta, scale,
                                           kv_scales=kv_scales)
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention,
        )

        B, H, D = q.shape
        L, P = pool.shape[0], pool.shape[1]
        Ds = pool.shape[-1]
        scale = scale if scale is not None else 1.0 / math.sqrt(D)
        flat = pool.reshape((L * P,) + pool.shape[2:])
        tables = meta.block_tables + jnp.int32(layer) * P
        cu_q_lens = jnp.arange(B + 1, dtype=jnp.int32)
        num_seqs = jnp.array([B], jnp.int32)
        # sub-128 head dims: q rides zero-padded 128 lanes like the pool
        # (store_dim); pad lanes are exact no-ops through the attention
        if Ds != D:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, Ds - D)))
        # the kernel's block-size heuristic targets vmem_limit_bytes; the
        # 16 MB default overflows by ~24 KB at (B=144, 28 layers, KH=8)
        # inside the fused-decode scan (scoped-vmem OOM at compile). v5e
        # has 128 MB VMEM/core; 64 MB is the vLLM-TPU operating point.
        vmem_mb = int(os.environ.get("VOX_RAGGED_VMEM_MB", "64"))
        quant_kw = {}
        if kv_scales is not None:
            # in-kernel dequant: k/v pages load at 1 byte/elem and convert
            # to f32 in VMEM (kernel.py k_scale/v_scale path)
            quant_kw = {"k_scale": float(kv_scales[0]),
                        "v_scale": float(kv_scales[1])}
        out = ragged_paged_attention(
            q, flat, meta.seq_lens, tables, cu_q_lens, num_seqs,
            sm_scale=float(scale), vmem_limit_bytes=vmem_mb * 1024 * 1024,
            **quant_kw)
        return out[..., :D] if Ds != D else out

    if use_pallas:
        from .pallas_attention import pallas_paged_attention_decode

        return pallas_paged_attention_decode(
            q, k_pages, v_pages, layer, meta, scale=scale
        )

    B, H, D = q.shape
    KH = k_pages.shape[1]
    page_size = k_pages.shape[3]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)

    # (KH, B, maxP, page, D) -> (B, S, KH, D) with S = maxP * page
    k = jnp.take(k_pages[layer], meta.block_tables, axis=1)
    v = jnp.take(v_pages[layer], meta.block_tables, axis=1)
    S = k.shape[2] * page_size
    k = jnp.moveaxis(k.reshape(KH, B, S, D), 0, 2)
    v = jnp.moveaxis(v.reshape(KH, B, S, D), 0, 2)
    k = _repeat_kv(k, H // KH)
    v = _repeat_kv(v, H // KH)

    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("bhd,bshd->bhs", qf, k.astype(jnp.float32))
    token_idx = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)
    mask = token_idx < meta.seq_lens[:, None]
    scores = jnp.where(mask[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhs,bshd->bhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
