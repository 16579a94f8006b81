"""Pallas TPU kernel: paged-attention decode (flash-decoding over block
tables).

Replaces FlashInfer's BatchDecodeWithPagedKVCacheWrapper (reference
flashinfer_utils.py:149-248) with a TPU-native kernel:

  grid = (batch, kv_heads); each program owns one request's query group
  (G = H / KH heads) and streams that request's KV pages from HBM to VMEM in
  128-token chunks with double-buffered async DMA, accumulating an online
  (numerically stable, f32) softmax. Block tables and sequence lengths are
  scalar-prefetched so DMA addresses are computable before the kernel body.

The pure-JAX gather path in attention.py stays as the CPU/interpret reference
and the fallback for tiny shapes (kernel parity is asserted in
tests/test_pallas_attention.py via interpret mode).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


#: tokens moved per decode-kernel DMA chunk; the worker sizes block tables
#: so chunks stay full-width (worker/base.py uses this constant)
CHUNK_TOKENS = 128


def decode_fold(head_dim: int) -> int:
    """Lane-fold factor of the legacy (pair-layout) decode kernel for
    sub-128 head dims; the kernel requires 128 % head_dim == 0 and
    page_size % fold == 0 (single source of the rule the worker checks)."""
    return max(1, 128 // head_dim) if head_dim <= 128 else 1


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, maxP) int32 in SMEM
    seq_lens_ref,      # (B,) int32 in SMEM
    layer_ref,         # (1,) int32 in SMEM — layer plane of the 5-D pool
    # inputs
    q_ref,             # (1, 1, fold, G, D*fold) VMEM block (fold-offset padded)
    k_hbm,             # (L, KH, P, page, D) in ANY/HBM — head-major layout so
    v_hbm,             # a page DMA is an aligned (page, D) tile. The FULL
                       # pool is passed (layer indexed inside the DMA): a
                       # host-visible layer slice materializes ~GBs of copy
                       # per scan step (measured 13 ms/step at 28 layers).
    # output
    o_ref,             # (1, 1, G, D) VMEM block
    # scratch
    k_scratch,         # (2, CP, page/fold, D*fold) VMEM
    v_scratch,         # (2, CP, page/fold, D*fold)
    acc_ref,           # (G, D*fold) f32
    m_ref,             # (G, 128) f32 (row max, broadcast along lanes)
    l_ref,             # (G, 128) f32 (row sum)
    sems,              # DMA semaphores (2, 2, CP)
    *,
    page_size: int,
    chunk_pages: int,
    max_pages: int,
    scale: float,
    head_dim: int,
    fold: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    lyr = layer_ref[0]
    seq_len = seq_lens_ref[b]
    chunk_tokens = chunk_pages * page_size
    num_chunks = pl.cdiv(seq_len, chunk_tokens)

    def start_chunk_dma(slot, c):
        for i in range(chunk_pages):
            page_idx = c * chunk_pages + i
            # pages beyond the table clamp to the LAST table entry (a
            # real page for a live request; safe only because tail-chunk
            # scores are seq_len-masked)
            pid = block_tables_ref[b, jnp.minimum(page_idx, max_pages - 1)]
            pltpu.make_async_copy(
                k_hbm.at[lyr, h, pid], k_scratch.at[slot, i],
                sems.at[0, slot, i]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[lyr, h, pid], v_scratch.at[slot, i],
                sems.at[1, slot, i]
            ).start()

    def wait_chunk_dma(slot):
        for i in range(chunk_pages):
            pltpu.make_async_copy(
                k_hbm.at[0, 0, 0], k_scratch.at[slot, i], sems.at[0, slot, i]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[0, 0, 0], v_scratch.at[slot, i], sems.at[1, slot, i]
            ).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    start_chunk_dma(0, 0)

    width = head_dim * fold  # lane width of the folded KV tiles (128 if folded)
    rows = chunk_tokens // fold

    # per-fold-offset padded queries, prepared on host: q_all[j] has the real
    # query in lane block [j*D, (j+1)*D) and zeros elsewhere, so
    # q_all[j] @ k_folded^T picks out exactly the tokens at fold offset j
    # without any in-kernel lane slicing (Mosaic rejects minor-dim reshapes).
    q_all = q_ref[0, 0].astype(jnp.float32) * scale  # (fold, G, width)

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        next_slot = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            start_chunk_dma(next_slot, c + 1)

        wait_chunk_dma(slot)

        # collapse leading dims only — minor (lane) dim unchanged, legal cast
        k = k_scratch[slot].astype(jnp.float32).reshape(rows, width)
        v = v_scratch[slot].astype(jnp.float32).reshape(rows, width)

        row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        lane_blk = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1) \
            // head_dim

        # scores per fold offset: block j covers tokens c*chunk + fold*i + j
        blocks = []
        for j in range(fold):
            s = jax.lax.dot_general(
                q_all[j], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, rows)
            idx = c * chunk_tokens + fold * row_idx + j
            blocks.append(jnp.where(idx < seq_len, s, NEG_INF))

        m_prev = m_ref[:, :1]                         # (G, 1)
        m_cur = jnp.max(blocks[0], axis=1, keepdims=True)
        for s in blocks[1:]:
            m_cur = jnp.maximum(m_cur, jnp.max(s, axis=1, keepdims=True))
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)               # (G, 1)

        l_new = l_ref[:, :1] * alpha
        acc = acc_ref[...] * alpha                    # (G, width)
        for j in range(fold):
            p = jnp.exp(blocks[j] - m_new)            # (G, rows)
            l_new = l_new + jnp.sum(p, axis=1, keepdims=True)
            # mask v to lane block j so p_j only lands in its own block
            vj = v if fold == 1 else jnp.where(lane_blk == j, v, 0.0)
            acc = acc + jax.lax.dot_general(
                p, vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        l_ref[:, :1] = l_new
        m_ref[:, :1] = m_new
        acc_ref[...] = acc
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)

    l = l_ref[:, :1]
    l = jnp.where(l == 0.0, 1.0, l)
    acc = acc_ref[...]
    if fold > 1:
        # fold the (G, width) accumulator back to (G, D): out[g, d] =
        # sum_j acc[g, j*D + d], via a constant 0/1 selection matmul
        # (lane-dim reshapes are illegal in Mosaic; a matmul is not)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (width, head_dim), 0)
               % head_dim
               == jax.lax.broadcasted_iota(jnp.int32, (width, head_dim), 1)
               ).astype(jnp.float32)
        acc = jax.lax.dot_general(
            acc, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _decode_kernel_perreq(
    # scalar prefetch
    block_tables_ref,  # (B, maxP) int32 in SMEM
    seq_lens_ref,      # (B,) int32 in SMEM
    layer_ref,         # (1,) int32 in SMEM — layer plane of the 5-D pool
    # inputs
    q_ref,             # (1, KH, G, D) VMEM block
    k_hbm,             # (L, KH, P, page, D) ANY/HBM — full pool, layer
    v_hbm,             # indexed inside the DMA (see _decode_kernel)
    # output
    o_ref,             # (1, KH, G, D) VMEM block
    # scratch
    k_scratch,         # (2, CP, page, D) VMEM
    v_scratch,
    sems,              # DMA semaphores (2, 2, CP)
    *,
    page_size: int,
    chunk_pages: int,
    max_pages: int,
    scale: float,
    kv_heads: int,
    group: int,
):
    """One program per REQUEST (all KV heads inside): the v5e runs Mosaic
    grid programs sequentially on its single TensorCore, so at decode shapes
    the per-program overhead of a (B, KH) grid dominates the kernel (~1 us x
    768 programs/layer measured). Softmax state lives in fori carries, not
    scratch refs."""
    b = pl.program_id(0)
    lyr = layer_ref[0]
    seq_len = seq_lens_ref[b]
    chunk_tokens = chunk_pages * page_size
    num_chunks = pl.cdiv(seq_len, chunk_tokens)

    def start_chunk_dma(slot, h, c):
        for i in range(chunk_pages):
            page_idx = c * chunk_pages + i
            pid = block_tables_ref[b, jnp.minimum(page_idx, max_pages - 1)]
            pltpu.make_async_copy(
                k_hbm.at[lyr, h, pid], k_scratch.at[slot, i],
                sems.at[0, slot, i]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[lyr, h, pid], v_scratch.at[slot, i],
                sems.at[1, slot, i]
            ).start()

    def wait_chunk_dma(slot):
        for i in range(chunk_pages):
            pltpu.make_async_copy(
                k_hbm.at[0, 0, 0], k_scratch.at[slot, i], sems.at[0, slot, i]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[0, 0, 0], v_scratch.at[slot, i], sems.at[1, slot, i]
            ).wait()

    D = q_ref.shape[-1]
    for h in range(kv_heads):  # static unroll: all state statically indexed
        q = q_ref[0, h].astype(jnp.float32) * scale  # (G, D)

        start_chunk_dma(0, h, 0)

        def body(c, carry, h=h):
            m, l, acc = carry

            @pl.when(c + 1 < num_chunks)
            def _():
                start_chunk_dma(jax.lax.rem(c + 1, 2), h, c + 1)

            wait_chunk_dma(jax.lax.rem(c, 2))

            k = k_scratch[jax.lax.rem(c, 2)].astype(jnp.float32)
            v = v_scratch[jax.lax.rem(c, 2)].astype(jnp.float32)
            k = k.reshape(chunk_tokens, D)
            v = v.reshape(chunk_tokens, D)

            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (G, chunk)
            token_idx = c * chunk_tokens + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            scores = jnp.where(token_idx < seq_len, scores, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
            p = jnp.exp(scores - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l, acc

        m0 = jnp.full((group, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((group, 1), jnp.float32)
        acc0 = jnp.zeros((group, D), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, h] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _pallas_decode_call(q, k_pages, v_pages, block_tables, seq_lens,
                        layer=None, scale=None, interpret=False):
    """k_pages/v_pages: (KH, P, page, D) with layer=None, or the FULL
    (L, KH, P, page, D) pool with a traced ``layer`` index. The layer rides
    scalar prefetch and is resolved inside the DMA — slicing the pool on the
    host side of the kernel boundary materializes the slice as a copy when
    the pool is a scan carry (~190 MB x 2 x L per step; measured 13 ms/step
    for the 1.7B flagship at B=1)."""
    B, H, D = q.shape
    if k_pages.ndim == 4:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
        layer = jnp.zeros((1,), jnp.int32)
    else:
        layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    L, KH, P, page_size, _ = k_pages.shape
    G = H // KH
    max_pages = block_tables.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)

    # head_dim < 128 (e.g. CSM/Chatterbox D=64): FOLD token groups into the
    # lane axis — (page, D) rows view as (page/fold, 128) tiles, a pure
    # bitcast (row-major layout unchanged), so the page DMA stays 128-lane
    # aligned. The kernel computes attention directly in folded space (Mosaic
    # rejects minor-dim reshapes): per-offset score blocks against the folded
    # KV, masked-V accumulation, and a selection matmul to fold the output.
    fold = max(1, 128 // D)
    if fold > 1:
        if page_size % fold != 0:
            raise ValueError(
                f"page_size {page_size} must be divisible by 128/{D}")
        k_pages = k_pages.reshape(L, KH, P, page_size // fold, D * fold)
        v_pages = v_pages.reshape(L, KH, P, page_size // fold, D * fold)
    width = D * fold
    folded_page = page_size // fold

    # chunk = up to 128 tokens of KV per DMA round. max_pages need not be a
    # multiple: the tail chunk's page indices clamp to the last table entry
    # and its scores are masked by seq_len.
    chunk_pages = max(1, min(128 // page_size, max_pages))

    if fold == 1:
        # per-request kernel: grid (B,) with a static loop over KV heads —
        # 8x fewer sequential grid programs than (B, KH) (see
        # _decode_kernel_perreq docstring)
        q4 = q.reshape(B, KH, G, D)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, KH, G, D), lambda b, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, KH, G, D), lambda b, *_: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_pages, page_size, D), k_pages.dtype),
                pltpu.VMEM((2, chunk_pages, page_size, D), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2, chunk_pages)),
            ],
        )
        kernel = functools.partial(
            _decode_kernel_perreq, page_size=page_size,
            chunk_pages=chunk_pages, max_pages=max_pages, scale=scale,
            kv_heads=KH, group=G)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, KH, G, D), q.dtype),
            interpret=interpret,
        )(block_tables, seq_lens, layer, q4, k_pages, v_pages)
        return out.reshape(B, H, D)

    # q padded per fold offset: q_pad[b, h, j, g, j*D:(j+1)*D] = q[b, h*G+g]
    q4 = q.reshape(B, KH, G, D)
    if fold > 1:
        eye = jnp.eye(fold, dtype=q.dtype)
        q4 = jnp.einsum("jf,bhgd->bhjgfd", eye, q4)
        q4 = q4.reshape(B, KH, fold, G, width)
    else:
        q4 = q4.reshape(B, KH, 1, G, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, KH),
        in_specs=[
            pl.BlockSpec((1, 1, fold, G, width),
                         lambda b, h, *_: (b, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_pages, folded_page, width), k_pages.dtype),
            pltpu.VMEM((2, chunk_pages, folded_page, width), v_pages.dtype),
            pltpu.VMEM((G, width), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, chunk_pages)),
        ],
    )

    kernel = functools.partial(
        _decode_kernel,
        page_size=page_size,
        chunk_pages=chunk_pages,
        max_pages=max_pages,
        scale=scale,
        head_dim=D,
        fold=fold,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, D), q.dtype),
        interpret=interpret,
    )(block_tables, seq_lens, layer, q4, k_pages, v_pages)
    return out.reshape(B, H, D)


def pallas_paged_attention_decode(q, k_pages, v_pages, layer, meta,
                                  scale=None, interpret=False):
    """Drop-in for attention.paged_attention_decode (use_pallas path).

    q: (B, H, D); k_pages/v_pages: (L, KH, P, page, D) — head-major
    (kv_cache.py:51) — `layer` selects the layer plane (traced index OK).
    The full pool goes into the kernel; the layer index is resolved inside
    the page DMA (a host-side layer slice of a scan-carried pool
    materializes as a copy — 13 ms/step for the 1.7B flagship)."""
    if k_pages.ndim == 5:
        return _pallas_decode_call(q, k_pages, v_pages, meta.block_tables,
                                   meta.seq_lens, layer=jnp.int32(layer),
                                   scale=scale, interpret=interpret)
    return _pallas_decode_call(q, k_pages, v_pages, meta.block_tables,
                               meta.seq_lens, scale=scale,
                               interpret=interpret)
