import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.ops.attention import (
    AttnMetadata,
    paged_attention_decode,
    ragged_prefill_attention,
    write_kv_decode,
    write_kv_prefill,
)
from vox_serve_tpu.ops.kv_cache import KVCacheConfig, PageAllocator, alloc_kv_pages
from vox_serve_tpu.ops.rope import apply_rope, rope_frequencies


def dense_attention(q, k, v, causal_upto=None):
    """Oracle: q (Tq, H, D) over k/v (Tk, KH, D), optional causal mask."""
    H, KH = q.shape[1], k.shape[1]
    k = jnp.repeat(k, H // KH, axis=1)
    v = jnp.repeat(v, H // KH, axis=1)
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("thd,shd->hts", q * scale, k)
    if causal_upto is not None:
        Tq, Tk = q.shape[0], k.shape[0]
        qpos = jnp.arange(Tq)[:, None] + (Tk - Tq)
        mask = qpos >= jnp.arange(Tk)[None, :]
        scores = jnp.where(mask[None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hts,shd->thd", p, v)


def test_page_allocator():
    a = PageAllocator(8)
    assert a.num_free == 7
    pages = a.alloc(3)
    assert 0 not in pages
    assert a.num_free == 4
    a.free(pages)
    assert a.num_free == 7
    with pytest.raises(Exception):
        a.alloc(8)
    with pytest.raises(Exception):
        a.free([0])


def _rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, dtype=jnp.float32)


def test_prefill_matches_dense_per_segment():
    T, H, KH, D = 16, 4, 2, 8
    q = _rand(0, (T, H, D))
    k = _rand(1, (T, KH, D))
    v = _rand(2, (T, KH, D))
    # two segments: tokens 0..9 (req 0), 10..13 (req 1), 14..15 padding
    seg = jnp.array([0] * 10 + [1] * 4 + [-1] * 2, dtype=jnp.int32)
    pos = jnp.array(list(range(10)) + list(range(4)) + [0, 0], dtype=jnp.int32)
    meta = AttnMetadata(
        is_prefill=True,
        kv_page_ids=jnp.zeros(T, jnp.int32),
        kv_page_offsets=jnp.zeros(T, jnp.int32),
        segment_ids=seg,
        q_positions=pos,
    )
    out = ragged_prefill_attention(q, k, v, meta)
    ref0 = dense_attention(q[:10], k[:10], v[:10], causal_upto=True)
    ref1 = dense_attention(q[10:14], k[10:14], v[10:14], causal_upto=True)
    np.testing.assert_allclose(np.asarray(out[:10]), np.asarray(ref0), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[10:14]), np.asarray(ref1), rtol=2e-5, atol=2e-5)


def test_paged_decode_matches_dense():
    """Write a sequence into pages token by token, decode last token, compare
    against dense causal attention."""
    cfg = KVCacheConfig(num_layers=2, num_pages=8, page_size=4, num_kv_heads=2, head_dim=8)
    k_pages, v_pages = alloc_kv_pages(cfg, None)
    k_pages = k_pages.astype(jnp.float32)
    v_pages = v_pages.astype(jnp.float32)
    alloc = PageAllocator(cfg.num_pages)

    H, KH, D = 4, 2, 8
    seq_len = 7  # 2 pages: 4 + 3
    pages = alloc.alloc(2)
    ks = _rand(3, (seq_len, KH, D))
    vs = _rand(4, (seq_len, KH, D))

    # write all 7 tokens (simulate prefill write)
    page_ids = jnp.array([pages[i // cfg.page_size] for i in range(seq_len)], jnp.int32)
    offsets = jnp.array([i % cfg.page_size for i in range(seq_len)], jnp.int32)
    meta_w = AttnMetadata(True, page_ids, offsets)
    for layer in range(2):
        k_pages, v_pages = write_kv_prefill(k_pages, v_pages, layer, ks, vs, meta_w)

    # decode: batch of 1 (padded to 2 with scratch), query attends all 7
    q = _rand(5, (2, H, D))
    block_tables = jnp.array([[pages[0], pages[1], 0], [0, 0, 0]], jnp.int32)
    seq_lens = jnp.array([seq_len, 1], jnp.int32)
    meta_d = AttnMetadata(
        False,
        kv_page_ids=jnp.zeros(2, jnp.int32),
        kv_page_offsets=jnp.zeros(2, jnp.int32),
        block_tables=block_tables,
        seq_lens=seq_lens,
    )
    for layer in range(2):
        out = paged_attention_decode(q, k_pages, v_pages, layer, meta_d)
        ref = dense_attention(q[0:1], ks, vs)[0] if layer == 0 else None
        if layer == 0:
            np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_write_then_read_roundtrip():
    """Incremental decode: append one token per step, check attention result
    evolves exactly like dense attention over the growing sequence."""
    cfg = KVCacheConfig(num_layers=1, num_pages=6, page_size=2, num_kv_heads=1, head_dim=4)
    k_pages, v_pages = alloc_kv_pages(cfg)
    k_pages = k_pages.astype(jnp.float32)
    v_pages = v_pages.astype(jnp.float32)
    alloc = PageAllocator(cfg.num_pages)
    pages = alloc.alloc(3)

    H, D = 2, 4
    all_k = _rand(6, (5, 1, D))
    all_v = _rand(7, (5, 1, D))
    bt = jnp.array([pages + [0]], jnp.int32)  # width 4
    for t in range(5):
        meta = AttnMetadata(
            False,
            kv_page_ids=jnp.array([pages[t // 2]], jnp.int32),
            kv_page_offsets=jnp.array([t % 2], jnp.int32),
            block_tables=bt,
            seq_lens=jnp.array([t + 1], jnp.int32),
        )
        k_pages, v_pages = write_kv_decode(
            k_pages, v_pages, 0, all_k[t : t + 1], all_v[t : t + 1], meta
        )
        q = _rand(100 + t, (1, H, D))
        out = paged_attention_decode(q, k_pages, v_pages, 0, meta)
        ref = dense_attention(q, all_k[: t + 1], all_v[: t + 1])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_rope_rotation_invariants():
    T, H, D = 6, 2, 8
    inv = rope_frequencies(D)
    q = _rand(8, (T, H, D))
    k = _rand(9, (T, H, D))
    pos = jnp.arange(T, dtype=jnp.int32)
    q1, k1 = apply_rope(q, k, pos, inv)
    # norm-preserving
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q1), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        rtol=1e-5,
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(q1[0]), np.asarray(q[0]), rtol=1e-6)
    # relative property: dot(q(m), k(n)) depends only on m - n
    def score(m, n):
        qm, kn = apply_rope(q[:1], k[:1], jnp.array([m]), inv)[0], \
                 apply_rope(q[:1], k[:1], jnp.array([n]), inv)[1]
        return float(jnp.sum(qm[0, 0] * kn[0, 0]))
    np.testing.assert_allclose(score(5, 3), score(7, 5), rtol=1e-4)


def test_rope_llama31_scaling_changes_low_freqs():
    D = 128
    base = rope_frequencies(D, theta=500000.0)
    scaled = rope_frequencies(D, theta=500000.0, llama31_scaling=True)
    # high-frequency components unchanged, low-frequency scaled down
    assert np.allclose(np.asarray(base[:8]), np.asarray(scaled[:8]))
    assert np.all(np.asarray(scaled[-8:]) < np.asarray(base[-8:]))


@pytest.mark.parametrize("D", [128, 64])
def test_combined_pool_matches_legacy_decode(D):
    """Combined token-major pool (L, P, page, 2KH, Ds) must produce decode
    attention identical to the legacy (L, KH, P, page, D) pair (gather paths
    on CPU; on TPU the combined path runs the stock ragged kernel, covered by
    the on-TPU parity drive in artifacts/). D=64 exercises the zero-padded
    128-lane store_dim (CSM/Chatterbox/CosyVoice2 head dims)."""
    L, P, page, KH, H = 2, 8, 4, 2, 4
    B = 3
    cfg_legacy = KVCacheConfig(num_layers=L, num_pages=P, page_size=page,
                               num_kv_heads=KH, head_dim=D,
                               dtype=jnp.float32)
    cfg_comb = KVCacheConfig(num_layers=L, num_pages=P, page_size=page,
                             num_kv_heads=KH, head_dim=D,
                             dtype=jnp.float32, combined=True)
    kp, vp = alloc_kv_pages(cfg_legacy)
    pool, none = alloc_kv_pages(cfg_comb)
    assert none is None
    assert pool.shape == (L, P, page, 2 * KH, cfg_comb.store_dim)
    assert cfg_comb.store_dim == 128

    # write 3 requests x several tokens through BOTH layouts, layer by layer
    rng = np.random.default_rng(0)
    tables = np.zeros((B, 3), np.int32)
    tables[0, :2] = [1, 2]
    tables[1, :1] = [3]
    tables[2, :3] = [4, 5, 6]
    lens = np.array([6, 3, 9], np.int32)
    for layer in range(L):
        for b in range(B):
            for t in range(lens[b]):
                pid = tables[b, t // page]
                off = t % page
                meta = AttnMetadata(
                    False, jnp.array([pid], jnp.int32),
                    jnp.array([off], jnp.int32))
                k = _rand(1000 + layer * 100 + b * 10 + t, (1, KH, D))
                v = _rand(2000 + layer * 100 + b * 10 + t, (1, KH, D))
                kp, vp = write_kv_decode(kp, vp, layer, k, v, meta)
                pool, _ = write_kv_decode(pool, None, layer, k, v, meta)

    meta = AttnMetadata(
        False, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        block_tables=jnp.asarray(tables), seq_lens=jnp.asarray(lens))
    for layer in range(L):
        q = _rand(7 + layer, (B, H, D))
        out_legacy = paged_attention_decode(q, kp, vp, layer, meta)
        out_comb = paged_attention_decode(q, pool, None, layer, meta)
        np.testing.assert_allclose(np.asarray(out_comb),
                                   np.asarray(out_legacy),
                                   rtol=2e-5, atol=2e-5)


def test_glm_interleaved_partial_rope_matches_chatglm_reference():
    """GLM-4-Voice uses ChatGLM rotary: interleaved pairs (2i, 2i+1) over
    the first head_dim//2 dims, pass-through beyond (the reference passes
    interleave=True, rotary_dim=head_dim//2 to flashinfer,
    glm_voice.py:148-155). Verify against a direct numpy transcription of
    ChatGLM's apply_rotary_pos_emb."""
    import numpy as np

    from vox_serve_tpu.ops.rope import apply_rope_interleaved, rope_frequencies

    T, H, D, RD = 5, 2, 16, 8
    rng = np.random.RandomState(0)
    q = rng.randn(T, H, D).astype(np.float32)
    k = rng.randn(T, 1, D).astype(np.float32)
    pos = np.arange(T, dtype=np.int32)
    theta = 10000.0

    inv = rope_frequencies(RD, theta)
    qj, kj = apply_rope_interleaved(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos), inv, rope_dim=RD)

    # numpy ChatGLM reference: rotary over xr=x[..., :RD] viewed as
    # (RD//2, 2) pairs, angle_i = pos * theta^(-2i/RD)
    def ref(x):
        invf = 1.0 / theta ** (np.arange(0, RD, 2, dtype=np.float64) / RD)
        ang = pos[:, None].astype(np.float64) * invf[None, :]
        cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        xr = x[..., :RD].reshape(x.shape[0], x.shape[1], RD // 2, 2)
        x1, x2 = xr[..., 0], xr[..., 1]
        out = np.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        out = out.reshape(x.shape[0], x.shape[1], RD)
        return np.concatenate([out, x[..., RD:]], axis=-1)

    np.testing.assert_allclose(np.asarray(qj), ref(q), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kj), ref(k), rtol=1e-5, atol=1e-5)


def test_glm_backbone_config_uses_interleaved_rope():
    from vox_serve_tpu.models.glm_voice import GLMVoiceLM

    cfg = GLMVoiceLM.backbone_config_for_testing() \
        if hasattr(GLMVoiceLM, "backbone_config_for_testing") else None
    if cfg is None:
        import inspect

        src = inspect.getsource(GLMVoiceLM)
        assert "rope_interleaved=True" in src
