"""Pallas TPU kernel: ragged (segment-masked) causal prefill attention.

Replaces the dense O(T^2)-materializing XLA path (attention.py
ragged_prefill_attention) for large prefill buckets. FlashInfer's ragged
prefill (reference flashinfer_utils.py:11-148) is the behavioral model; the
TPU design is a flash-attention sweep:

  grid = (T/BQ, KH): each program owns one 128-row query block for ALL G
  query heads of one KV head (the whole GQA group shares each K/V block DMA)
  and streams 256-token K/V blocks with double-buffered async DMA,
  maintaining an online (f32) softmax over the collapsed (G*BQ, BK) score
  tile. Blocks strictly above the diagonal are never loaded (causal
  skipping — half the bandwidth/FLOPs of the dense path, and no (H, T, T)
  score materialization at all).

Ragged masking: token i attends j iff segment[i] == segment[j] >= 0 and
j <= i in buffer order (segments are contiguous prompt spans, so buffer
order IS causal order — matching attention.py:155-159). Segment ids enter
twice, pre-shaped host-side so the kernel never relayouts a 1-D vector:
as (T/BQ, BQ, 1) sublane-oriented query rows and (T/BK, BK) lane-oriented
key rows.

Q enters as (KH, G, T, D) and K/V head-major (KH, T, D) so every block
access is contiguous. head_dim < 128 zero-pads D to the 128-lane width
(exact: zero dims add nothing to scores; padded output dims are sliced).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

BQ = 128
BK = 256


def _prefill_kernel(
    # scalar prefetch
    valid_len_ref,  # (1,) int32 in SMEM — tokens with segment >= 0
    # inputs
    q_ref,        # (1, G, BQ, D) VMEM block (q as (KH, G, T/BQ*BQ, D))
    seg_q_ref,    # (1, BQ, 1) VMEM block (sublane-oriented)
    seg_k_ref,    # (T/BK, BK) VMEM (whole array; lane-oriented rows)
    k_hbm,        # (KH, T, D) ANY/HBM
    v_hbm,        # (KH, T, D) ANY/HBM
    # output
    o_ref,        # (1, G, BQ, D) VMEM block
    # scratch
    k_scratch,    # (2, BK, D) VMEM
    v_scratch,    # (2, BK, D) VMEM
    acc_ref,      # (G*BQ, D) f32
    m_ref,        # (G*BQ, 128) f32
    l_ref,        # (G*BQ, 128) f32
    sems,         # DMA semaphores (2, 2)
    *,
    group: int,
    bk: int,
    scale: float,
):
    qb = pl.program_id(0)
    kv_h = pl.program_id(1)
    valid_len = valid_len_ref[0]

    def start_dma(slot, kb):
        pltpu.make_async_copy(
            k_hbm.at[kv_h, pl.ds(kb * bk, bk)], k_scratch.at[slot],
            sems.at[0, slot]).start()
        pltpu.make_async_copy(
            v_hbm.at[kv_h, pl.ds(kb * bk, bk)], v_scratch.at[slot],
            sems.at[1, slot]).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            k_hbm.at[0, pl.ds(0, bk)], k_scratch.at[slot],
            sems.at[0, slot]).wait()
        pltpu.make_async_copy(
            v_hbm.at[0, pl.ds(0, bk)], v_scratch.at[slot],
            sems.at[1, slot]).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    # k blocks covering [0, min((qb+1)*BQ, valid_len)) — causal bound AND
    # ragged bound: a short prompt in a big bucket only pays for its own
    # tokens, not the bucket (padding rows/cols are seg -1, fully masked)
    kv_span = jnp.minimum(qb * BQ + BQ, valid_len)
    num_blocks = jax.lax.div(kv_span + bk - 1, bk)

    @pl.when(num_blocks > 0)
    def _():
        start_dma(0, 0)

    D = q_ref.shape[-1]
    q = q_ref[0].astype(jnp.float32).reshape(group * BQ, D) * scale
    seg_q1 = seg_q_ref[0]                            # (BQ, 1) int32
    seg_q = jnp.concatenate([seg_q1] * group, axis=0)  # (G*BQ, 1)

    def body(kb, _):
        slot = jax.lax.rem(kb, 2)

        @pl.when(kb + 1 < num_blocks)
        def _():
            start_dma(jax.lax.rem(kb + 1, 2), kb + 1)

        wait_dma(slot)

        k = k_scratch[slot].astype(jnp.float32)     # (BK, D)
        v = v_scratch[slot].astype(jnp.float32)

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (G*BQ, BK)

        seg_k = seg_k_ref[kb].reshape(1, bk)        # (1, BK) int32
        same_seg = (seg_q == seg_k) & (seg_q >= 0)
        row = qb * BQ + jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0), BQ)
        col = kb * bk + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        scores = jnp.where(same_seg & (row >= col), scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_blocks, body, 0)

    l = l_ref[:, :1]
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc_ref[...] / l).reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _pallas_prefill_call(q, k, v, segment_ids, scale=None, interpret=False):
    T, H, D = q.shape
    KH = k.shape[1]
    G = H // KH
    bk = min(BK, T)
    if T % BQ != 0 or T % bk != 0:
        raise ValueError(f"prefill bucket {T} not a multiple of {BQ}/{bk}")
    nB = T // BQ
    scale = scale if scale is not None else 1.0 / math.sqrt(D)

    # sub-128 head dims (CSM/Chatterbox D=64): zero-pad D to the lane width.
    # Zero dims contribute nothing to q.k scores and the padded output dims
    # are sliced off — exact, at 2x kernel bandwidth (still beats the dense
    # path's (H, T, T) materialization).
    if D % 128 != 0:
        pad = 128 - D % 128
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
        out = _pallas_prefill_call(q, k, v, segment_ids, scale=scale,
                                   interpret=interpret)
        return out[:, :, :D]

    # (T, H, D) -> (KH, G, T, D): head h = kv*G + g (decode-kernel grouping)
    qt = q.reshape(T, KH, G, D).transpose(1, 2, 0, 3)
    kt = k.transpose(1, 0, 2)  # (KH, T, D) — contiguous per-head blocks
    vt = v.transpose(1, 0, 2)
    seg_q = segment_ids.astype(jnp.int32).reshape(nB, BQ, 1)
    seg_k = segment_ids.astype(jnp.int32).reshape(T // bk, bk)

    kernel = functools.partial(_prefill_kernel, group=G, bk=bk, scale=scale)

    valid_len = jnp.sum(segment_ids >= 0).astype(jnp.int32)[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB, KH),
        in_specs=[
            pl.BlockSpec((1, G, BQ, D), lambda qb, h, *_: (h, 0, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda qb, h, *_: (qb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, BQ, D), lambda qb, h, *_: (h, 0, qb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bk, D), kt.dtype),
            pltpu.VMEM((2, bk, D), vt.dtype),
            pltpu.VMEM((G * BQ, D), jnp.float32),
            pltpu.VMEM((G * BQ, 128), jnp.float32),
            pltpu.VMEM((G * BQ, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KH, G, T, D), q.dtype),
        interpret=interpret,
    )(valid_len, qt, seg_q, seg_k, kt, vt)
    return out.transpose(2, 0, 1, 3).reshape(T, H, D)


def pallas_ragged_prefill(q, k, v, meta, scale=None, interpret=False):
    """Drop-in for attention.ragged_prefill_attention.

    q: (T, H, D); k, v: (T, KH, D); meta.segment_ids: (T,) int32 with -1 for
    padding. Causality is buffer order (segments are contiguous spans).
    """
    return _pallas_prefill_call(q, k, v, meta.segment_ids, scale=scale,
                                interpret=interpret)
