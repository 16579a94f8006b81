"""Fused on-device sampling for the jitted decode step.

Replaces the reference's FlashInfer fused sampling kernels and
torch.compile'd repetition-penalty ops (vox_serve/sampling.py) with a single
pure-JAX pipeline that XLA fuses into the decode executable, so sampling never
leaves the device. Strategy dispatch (greedy / top-k / top-p / combined /
min-p, reference sampling.py:96-118) is resolved **in Python at trace time**
from the static per-server SamplingConfig, so each bucketed executable
contains exactly one sampling path and no device-side branching.

Repetition penalty follows the reference semantics exactly
(sampling.py:120-178): an appearance cache of shape
``(batch, window, n_codebooks, vocab)`` bool, OR-reduced over the window, with
``logits > 0 -> /p`` and ``logits <= 0 -> *p``; ``window == -1`` means a
single global plane that accumulates all generated tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling configuration (per server run, baked into jit)."""

    top_p: Optional[float] = None
    top_k: Optional[int] = None
    min_p: Optional[float] = None
    temperature: float = 1.0
    max_tokens: Optional[int] = None
    repetition_penalty: Optional[float] = None
    repetition_window: Optional[int] = None  # -1 => global window
    cfg_scale: Optional[float] = None
    greedy: bool = False

    def replace(self, **kw) -> "SamplingConfig":
        return dataclasses.replace(self, **kw)

    @property
    def uses_repetition_penalty(self) -> bool:
        return self.repetition_penalty is not None and self.repetition_penalty != 1.0

    @property
    def cache_window(self) -> int:
        """Number of window slots held in the repetition cache (>=1)."""
        if self.repetition_window is None or self.repetition_window == -1:
            return 1
        return max(int(self.repetition_window), 1)

    @property
    def is_greedy(self) -> bool:
        return bool(self.greedy) or self.temperature == 0.0


# ---------------------------------------------------------------------------
# repetition penalty
# ---------------------------------------------------------------------------


def init_repetition_cache(
    batch: int, window: int, n_codebooks: int, vocab: int
) -> jax.Array:
    """Fresh (all-False) appearance cache; per-request slices are zeroed on
    admission by the worker."""
    return jnp.zeros((batch, window, n_codebooks, vocab), dtype=jnp.bool_)


def apply_repetition_penalty(
    logits: jax.Array, cache: jax.Array, penalty: float
) -> jax.Array:
    """logits: (B, C_l, V); cache: (B, W, C, V) bool. If C_l == 1 < C, the
    codebook-0 plane of the cache is used (reference sampling.py:139-141)."""
    mask = jnp.any(cache, axis=1)  # (B, C, V)
    if logits.shape[1] == 1 and mask.shape[1] != 1:
        mask = mask[:, :1, :]
    scaled_down = logits / penalty
    scaled_up = logits * penalty
    penalized = jnp.where(logits > 0, scaled_down, scaled_up)
    return jnp.where(mask, penalized, logits)


def update_repetition_cache(
    cache: jax.Array, output_ids: jax.Array, global_window: bool
) -> jax.Array:
    """cache: (B, W, C, V) bool; output_ids: (B, C_ids) int32.

    Windowed (W>1): shift left, last slot = one-hot of the new tokens.
    Global (window == -1, W == 1): OR the new tokens into the single plane.
    If C_ids == 1 but C > 1, only the codebook-0 plane is touched
    (reference sampling.py:160-178).
    """
    B, W, C, V = cache.shape
    c_ids = output_ids.shape[1]
    onehot = jax.nn.one_hot(output_ids, V, dtype=jnp.bool_)  # (B, C_ids, V)
    if c_ids == 1 and C != 1:
        plane = jnp.concatenate(
            [onehot, jnp.zeros((B, C - 1, V), dtype=jnp.bool_)], axis=1
        )
    else:
        plane = onehot  # (B, C, V)
    if W > 1:
        shifted = jnp.concatenate([cache[:, 1:], plane[:, None]], axis=1)
        return shifted
    if global_window:
        return cache | plane[:, None]
    return plane[:, None]


# ---------------------------------------------------------------------------
# filtering primitives (all shape-static, fuse into the decode step)
# ---------------------------------------------------------------------------


def _mask_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep only the k largest logits along the last axis. k <= 0 is the
    common 'disabled' convention (HF/vLLM) — no-op rather than a trace-time
    shape error from lax.top_k."""
    k = min(int(k), logits.shape[-1])
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _mask_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering: keep the minimal prefix of the descending-prob
    distribution whose cumulative mass reaches p (the crossing token is
    kept)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep positions where mass *before* this token is < p
    keep = (cum - sorted_probs) < p
    # per-row logit threshold = smallest kept logit
    thresh = jnp.min(
        jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def _mask_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < top * min_p, NEG_INF, logits)


def _gumbel_sample(logits: jax.Array, rng: jax.Array) -> jax.Array:
    g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits.astype(jnp.float32) + g, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# fused sampler
# ---------------------------------------------------------------------------


def sample(
    logits: jax.Array,
    config: SamplingConfig,
    rng: jax.Array,
    repetition_cache: jax.Array | None = None,
) -> jax.Array:
    """Sample token ids from logits.

    Args:
      logits: (..., V) float; typically (B, C, V).
      config: static SamplingConfig — dispatch happens at trace time.
      rng: jax PRNG key (unused for greedy).
      repetition_cache: optional (B, W, C, V) bool appearance cache.

    Returns:
      int32 ids of shape logits.shape[:-1].

    Strategy order matches reference sampling.py:96-118: greedy | T==0 ->
    argmax; top_k & top_p -> combined (top_k first); top_k; top_p; min_p;
    fallback greedy.
    """
    logits = logits.astype(jnp.float32)
    if repetition_cache is not None and config.uses_repetition_penalty:
        logits = apply_repetition_penalty(
            logits, repetition_cache, float(config.repetition_penalty)
        )

    if config.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / float(config.temperature)

    # top_p >= 1.0 keeps the whole distribution — skip the O(V log V) sort
    top_p = config.top_p if (config.top_p is not None
                             and config.top_p < 1.0) else None
    if config.top_k is not None and top_p is not None:
        logits = _mask_top_k(logits, config.top_k)
        logits = _mask_top_p(logits, top_p)
    elif config.top_k is not None:
        logits = _mask_top_k(logits, config.top_k)
    elif top_p is not None:
        logits = _mask_top_p(logits, top_p)
    elif config.top_p is not None:
        pass  # top_p == 1.0 alone: full distribution
    elif config.min_p is not None:
        logits = _mask_min_p(logits, float(config.min_p))
    else:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return _gumbel_sample(logits, rng)


def sample_and_update(
    logits: jax.Array,
    config: SamplingConfig,
    rng: jax.Array,
    repetition_cache: jax.Array | None,
) -> tuple[jax.Array, jax.Array | None]:
    """sample() + repetition cache update in one traced step.

    Returns (ids, new_cache). ids shape = logits.shape[:-1]; for (B, C, V)
    logits the cache update uses the (B, C) ids directly.
    """
    ids = sample(logits, config, rng, repetition_cache)
    new_cache = repetition_cache
    if repetition_cache is not None and config.uses_repetition_penalty:
        ids2d = ids if ids.ndim == 2 else ids[:, None]
        new_cache = update_repetition_cache(
            repetition_cache,
            ids2d,
            global_window=(config.repetition_window in (None, -1)),
        )
    return ids, new_cache
