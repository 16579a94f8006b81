"""Paged KV cache: fixed-shape device arrays + a host-side page allocator.

TPU-first design notes (vs reference worker/base.py:170-179):
  * The cache is a pair of arrays per model,
    ``k_pages, v_pages: [layers, num_pages, page_size, kv_heads, head_dim]``
    in bf16. Fixed shape for the whole server lifetime — paging changes
    *indices*, never shapes, so XLA never recompiles.
  * Page tables are dense per-request rows ``[max_pages_per_seq]`` int32,
    padded with page 0 (a reserved scratch page, never allocated), assembled
    into a ``[batch_bucket, max_pages_per_seq]`` block-table input each step.
  * Allocation is host-side and O(1): a free-list. Page 0 is reserved as the
    scratch page used to pad dead batch slots (the reference's scratch-page
    trick, worker/cuda_graph_worker.py:857-866).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import cdiv


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    num_layers: int
    num_pages: int
    page_size: int
    num_kv_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    #: combined token-major layout (see alloc_kv_pages)
    combined: bool = False
    #: quantized pool storage: "none" (store at `dtype`), "f8_e4m3"
    #: (scale-free float8 — clip to +-448 and cast; no calibration needed),
    #: or "int8" (symmetric, static per-tensor amax via k_amax/v_amax).
    #: Halves pool HBM bytes AND decode attention DMA traffic vs bf16.
    #: Dequantization happens inside the ragged decode kernel (the stock
    #: kernel's k_scale/v_scale path); combined layout only. The current
    #: step's fresh K/V stay full-precision through prefill attention —
    #: only the POOL is quantized (vLLM fp8-KV semantics).
    quant: str = "none"
    #: int8 calibration: values are stored as round(x / (amax/127)),
    #: clipped to +-127. Defaults cover RMSNorm'd + RoPE'd K and V of the
    #: served families with >=4x headroom; override per model/checkpoint
    #: (scripts/calibrate_kv_scales.py prints measured absmax).
    k_amax: float = 16.0
    v_amax: float = 16.0

    def __post_init__(self):
        if self.quant not in ("none", "f8_e4m3", "int8"):
            raise ValueError(f"unknown kv quant mode {self.quant!r}")
        if self.quant != "none" and not self.combined:
            raise ValueError("quantized KV requires the combined layout")

    @property
    def pool_dtype(self):
        """Storage dtype of the page pool (quantized or `dtype`)."""
        if self.quant == "f8_e4m3":
            return jnp.float8_e4m3fn
        if self.quant == "int8":
            return jnp.int8
        return self.dtype

    @property
    def kv_scales(self):
        """(k_scale, v_scale) dequant multipliers for the decode kernel /
        gather path, or None when the pool is unquantized."""
        if self.quant == "f8_e4m3":
            return (1.0, 1.0)
        if self.quant == "int8":
            return (self.k_amax / 127.0, self.v_amax / 127.0)
        return None

    @property
    def max_tokens_pooled(self) -> int:
        return self.num_pages * self.page_size

    @property
    def store_dim(self) -> int:
        """Lane width of stored K/V rows. Combined pools zero-pad sub-128
        head dims up to the 128-lane tile: the ragged kernel then moves one
        (page, 2KH, 128) DMA per page for ALL heads' K+V, vs the fold
        kernel's per-(head, page) 2 KB DMAs — measured 0.38 vs 1.34 ms/layer
        in a 16-layer loop at CSM's decode shape (B=64, KH=8, D=64,
        scripts/exp_attn_inloop.py), and 94.5 -> ~10 ms of the real 116 ms
        step. Costs 2x pool bytes at D=64; the pad lanes are zeros, which is
        exact (zero q/k lanes add nothing to scores, zero v lanes are
        sliced off)."""
        if self.combined and self.head_dim < 128:
            return 128
        return self.head_dim

    def pages_for(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.page_size)


def combined_kv_supported(head_dim: int, num_kv_heads: int,
                          dtype=jnp.bfloat16) -> bool:
    """Whether (head_dim, KH) can use the combined token-major pool layout
    consumed by the ragged paged-attention kernel: lane dim = head_dim up
    to 128 (sub-128 dims are zero-padded to the 128-lane store_dim) and
    the combined 2*KH head axis XLA-fully-tileable at the KV dtype."""
    if head_dim > 128:
        return False
    packing = {1: 4, 2: 2, 4: 1}.get(jnp.dtype(dtype).itemsize, 1)
    x = 2 * num_kv_heads
    if x % packing:
        return False
    x //= packing
    return x in (1, 2, 4, 8) or x % 8 == 0


def alloc_kv_pages(cfg: KVCacheConfig, sharding=None):
    """Allocate the fixed-shape KV page pool(s) (zeros).

    Two layouts:

    * legacy (combined=False): a (k, v) PAIR, each (L, KH, P, page, D) —
      kv-head-major so a Pallas kernel can DMA one head's page as an aligned
      (page, D) tile; used for sub-128 head dims (fold kernel).
    * combined (combined=True): ONE pool (L, P, page, 2*KH, D) with K at
      even / V at odd combined-head indices (the vLLM-TPU convention consumed
      by jax's ragged_paged_attention kernel). Token-major: a single page DMA
      moves ALL heads' K AND V for page_size tokens — at decode batch 144
      this is the difference between ~1M 4 KB DMAs/step and ~16k 64 KB
      DMAs/step (measured 83 -> 31 ms per 28-layer step at seq 512). The
      layer index is resolved by OFFSETTING page indices into the
      (L*P, page, 2KH, D) flat view — no layer slice, no copy. The second
      returned value is None (callers thread (pool, None) where the legacy
      pair went).
    """
    pool_dtype = cfg.pool_dtype

    def _zeros(shape):
        if sharding is None:
            return jnp.zeros(shape, dtype=pool_dtype)
        # allocate each shard in place: an eager jnp.zeros would stage the
        # WHOLE mesh-aggregate pool on one device before resharding, OOMing
        # a TP deployment whose pool only fits the combined HBM
        return jax.jit(lambda: jnp.zeros(shape, dtype=pool_dtype),
                       out_shardings=sharding)()

    if cfg.combined:
        shape = (cfg.num_layers, cfg.num_pages, cfg.page_size,
                 2 * cfg.num_kv_heads, cfg.store_dim)
        return _zeros(shape), None
    shape = (cfg.num_layers, cfg.num_kv_heads, cfg.num_pages, cfg.page_size,
             cfg.head_dim)
    return _zeros(shape), _zeros(shape)


class PageAllocatorError(RuntimeError):
    pass


class PageAllocator:
    """Host-side O(1) free-list page allocator.

    Page 0 is reserved (scratch page for padded batch slots and page-table
    padding). Unlike the reference (queue.Empty escaping uncaught,
    worker/base.py:289), exhaustion raises a typed error so the scheduler can
    apply admission control.
    """

    SCRATCH_PAGE = 0

    def __init__(self, num_pages: int):
        if num_pages < 2:
            raise ValueError("need at least 2 pages (one reserved)")
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))  # pop() yields 1,2,...
        self._free_set = set(self._free)  # O(1) double-free detection
        # pages promised to admitted requests for their generation budget but
        # not yet materialized; admission control counts them as spoken-for so
        # decode-phase page growth can never hit exhaustion mid-stream
        self._reserved = 0

    @property
    def num_free(self) -> int:
        return len(self._free)

    @property
    def num_unreserved(self) -> int:
        return len(self._free) - self._reserved

    def alloc(self, n: int = 1, reserved: int = 0) -> list[int]:
        """Take n pages; `reserved` of them draw down this caller's prior
        reservation (the rest must fit the unreserved pool)."""
        reserved = min(reserved, n, self._reserved)
        if n - reserved > self.num_unreserved:
            raise PageAllocatorError(
                f"KV page pool exhausted: requested {n} ({reserved} reserved)"
                f", free {len(self._free)} (reserved {self._reserved})"
            )
        self._reserved -= reserved
        out = [self._free.pop() for _ in range(n)]
        self._free_set.difference_update(out)
        return out

    def free(self, pages: list[int]) -> None:
        # validate EVERYTHING before mutating: a partial free on error would
        # leak the tail of the list; a double-free would hand the same page
        # to two live requests (silent KV corruption)
        for p in pages:
            if p == self.SCRATCH_PAGE:
                raise PageAllocatorError("cannot free the scratch page")
            if not 0 < p < self.num_pages:
                raise PageAllocatorError(f"page {p} out of range")
            if p in self._free_set:
                raise PageAllocatorError(f"double free of page {p}")
        if len(set(pages)) != len(pages):
            raise PageAllocatorError("duplicate pages in one free() call")
        self._free.extend(pages)
        self._free_set.update(pages)

    def can_alloc(self, n: int) -> bool:
        return n <= self.num_unreserved

    # -- generation-budget reservations (admission control) ---------------
    def can_reserve(self, n: int) -> bool:
        return n <= self.num_unreserved

    def reserve(self, n: int) -> None:
        if not self.can_reserve(n):
            raise PageAllocatorError(
                f"cannot reserve {n} pages: free {len(self._free)}, "
                f"already reserved {self._reserved}")
        self._reserved += n

    def release_reservation(self, n: int) -> None:
        self._reserved = max(self._reserved - n, 0)
