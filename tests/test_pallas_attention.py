"""Parity: Pallas paged-decode kernel (interpret mode on CPU) vs the pure-JAX
gather reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.ops.attention import AttnMetadata, paged_attention_decode
from vox_serve_tpu.ops.pallas_attention import pallas_paged_attention_decode


def _setup(B=4, H=8, KH=4, D=128, page=16, max_pages=8, seed=0):
    key = jax.random.key(seed)
    ks = jax.random.split(key, 4)
    P = B * max_pages + 1
    q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
    k_pages = jax.random.normal(ks[1], (1, KH, P, page, D), jnp.float32)
    v_pages = jax.random.normal(ks[2], (1, KH, P, page, D), jnp.float32)
    # distinct page tables per request
    bt = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        bt[b] = np.arange(1 + b * max_pages, 1 + (b + 1) * max_pages)
    seq_lens = np.array([page * max_pages, 1, 37, page * 2], np.int32)[:B]
    meta = AttnMetadata(
        False, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        block_tables=jnp.asarray(bt), seq_lens=jnp.asarray(seq_lens),
    )
    return q, k_pages, v_pages, meta


def test_pallas_decode_matches_reference_interpret():
    q, k_pages, v_pages, meta = _setup()
    ref = paged_attention_decode(q, k_pages, v_pages, 0, meta)
    out = pallas_paged_attention_decode(q, k_pages, v_pages, 0, meta,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_decode_bf16_inputs():
    q, k_pages, v_pages, meta = _setup(seed=3)
    qb = q.astype(jnp.bfloat16)
    kb = k_pages.astype(jnp.bfloat16)
    vb = v_pages.astype(jnp.bfloat16)
    ref = paged_attention_decode(qb, kb, vb, 0, meta)
    out = pallas_paged_attention_decode(qb, kb, vb, 0, meta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)


def test_pallas_decode_single_token_seq():
    q, k_pages, v_pages, meta = _setup(B=2, max_pages=4, seed=5)
    meta = AttnMetadata(
        False, meta.kv_page_ids[:2], meta.kv_page_offsets[:2],
        block_tables=meta.block_tables[:2],
        seq_lens=jnp.array([1, 1], jnp.int32),
    )
    ref = paged_attention_decode(q, k_pages, v_pages, 0, meta)
    out = pallas_paged_attention_decode(q, k_pages, v_pages, 0, meta,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("D", [64, 32])
def test_pallas_decode_folded_head_dim(D):
    # head_dim < 128 (CSM/Chatterbox D=64): the kernel folds token pairs into
    # the 128-lane axis; parity must hold vs the gather path
    q, k_pages, v_pages, meta = _setup(D=D, seed=11)
    ref = paged_attention_decode(q, k_pages, v_pages, 0, meta)
    out = pallas_paged_attention_decode(q, k_pages, v_pages, 0, meta,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_decode_page_size_128():
    q, k_pages, v_pages, meta = _setup(B=2, page=128, max_pages=4, seed=7)
    meta = AttnMetadata(
        False, meta.kv_page_ids[:2], meta.kv_page_offsets[:2],
        block_tables=meta.block_tables[:2],
        seq_lens=jnp.array([300, 129], jnp.int32),
    )
    ref = paged_attention_decode(q, k_pages, v_pages, 0, meta)
    out = pallas_paged_attention_decode(q, k_pages, v_pages, 0, meta,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_decode_mha_g1():
    # Zonos-style MHA: KH == H (query group of 1)
    q, k_pages, v_pages, meta = _setup(H=8, KH=8, seed=13)
    ref = paged_attention_decode(q, k_pages, v_pages, 0, meta)
    out = pallas_paged_attention_decode(q, k_pages, v_pages, 0, meta,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
