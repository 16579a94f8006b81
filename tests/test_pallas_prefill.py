"""Parity: Pallas ragged prefill kernel (interpret mode on CPU) vs the dense
masked XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.ops.attention import AttnMetadata, ragged_prefill_attention
from vox_serve_tpu.ops.pallas_prefill import pallas_ragged_prefill


def _setup(T=256, H=8, KH=4, D=128, segs=((0, 100), (1, 37), (2, 64)),
           seed=0):
    key = jax.random.key(seed)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (T, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (T, KH, D), jnp.float32)
    v = jax.random.normal(ks[2], (T, KH, D), jnp.float32)
    seg = np.full((T,), -1, np.int32)
    pos = np.zeros((T,), np.int32)
    off = 0
    for sid, ln in segs:
        seg[off:off + ln] = sid
        pos[off:off + ln] = np.arange(ln)
        off += ln
    meta = AttnMetadata(
        True, jnp.zeros((T,), jnp.int32), jnp.zeros((T,), jnp.int32),
        segment_ids=jnp.asarray(seg), q_positions=jnp.asarray(pos),
    )
    return q, k, v, meta


@pytest.mark.parametrize("D", [128, 64])
def test_prefill_parity(D):
    q, k, v, meta = _setup(D=D)
    ref = ragged_prefill_attention(q, k, v, meta)
    out = pallas_ragged_prefill(q, k, v, meta, interpret=True)
    # padded rows attend nothing in both paths; compare valid rows
    valid = np.asarray(meta.segment_ids) >= 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-3, atol=2e-3)


def test_prefill_parity_full_bucket_single_segment():
    q, k, v, meta = _setup(T=256, segs=((0, 256),), seed=3)
    ref = ragged_prefill_attention(q, k, v, meta)
    out = pallas_ragged_prefill(q, k, v, meta, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_prefill_bf16():
    q, k, v, meta = _setup(seed=5)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = ragged_prefill_attention(qb, kb, vb, meta)
    out = pallas_ragged_prefill(qb, kb, vb, meta, interpret=True)
    valid = np.asarray(meta.segment_ids) >= 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid], np.asarray(ref, np.float32)[valid],
        rtol=5e-2, atol=5e-2)
