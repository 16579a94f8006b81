"""Channels-last (NHC) codec decoder path vs the NCH path.

The Qwen3 codec decoder defaults to NHC (codecs/qwen3_codec.py:
_decoder_blocks_nhc) because the narrow-channel blocks measured ~1.2x
faster with C on the TPU lane axis (artifacts/conv_forms_r4.md). These
tests pin (a) the layer primitives to their NCH twins and (b) the full
streaming pipeline to the NCH pipeline, caches included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.layers import (
    conv1d, conv1d_nhc, conv_transpose1d, conv_transpose1d_nhc,
    init_conv1d, init_conv_transpose1d,
)
from vox_serve_tpu.codecs.qwen3_codec import (
    Qwen3CodecConfig, init_qwen3_codec, qwen3_codec_decode_chunk,
    qwen3_codec_init_cache,
)


@pytest.mark.parametrize("dil,groups", [(1, 1), (9, 1), (1, 4)])
def test_conv1d_nhc_matches_nch(dil, groups):
    key = jax.random.key(0)
    B, Ci, Co, T, k = 2, 8, 12, 40, 7
    p = init_conv1d(key, Ci, Co, k, groups=groups)
    x = jax.random.normal(jax.random.key(1), (B, Ci, T))
    want = conv1d(p, x, padding=(6 * dil, 0), dilation=dil, groups=groups)
    got = conv1d_nhc(p, x.transpose(0, 2, 1), padding=(6 * dil, 0),
                     dilation=dil, groups=groups).transpose(0, 2, 1)
    assert jnp.allclose(got, want, atol=1e-5), float(jnp.abs(got - want).max())


@pytest.mark.parametrize("stride,groups", [(2, 1), (4, 1), (2, 2)])
def test_conv_transpose1d_nhc_matches_nch(stride, groups):
    key = jax.random.key(2)
    B, Ci, Co, T = 2, 8, 12, 20
    k = 2 * stride
    p = init_conv_transpose1d(key, Ci, Co, k, groups=groups)
    x = jax.random.normal(jax.random.key(3), (B, Ci, T))
    want = conv_transpose1d(p, x, stride=stride, groups=groups)
    got = conv_transpose1d_nhc(p, x.transpose(0, 2, 1), stride=stride,
                               groups=groups).transpose(0, 2, 1)
    assert got.shape == want.shape
    assert jnp.allclose(got, want, atol=1e-5), float(jnp.abs(got - want).max())


CFG = Qwen3CodecConfig(
    codebook_dim=64, codebook_size=64, latent_dim=96, decoder_dim=192,
    hidden_size=64, intermediate_size=96, head_dim=32, num_heads=2,
    num_kv_heads=2, num_layers=2, num_quantizers=4, sliding_window=16,
    vq_dim=32,
)


def _decode(params, codes, batch):
    cache = qwen3_codec_init_cache(CFG, batch)
    outs, trees = [], []
    for s in range(0, codes.shape[-1], 4):
        wav, cache = qwen3_codec_decode_chunk(
            params, CFG, codes[:, :, s:s + 4], cache)
        outs.append(np.asarray(wav))
    return np.concatenate(outs, axis=-1), cache


@pytest.mark.slow
def test_nhc_pipeline_matches_nch(monkeypatch):
    """Full streaming decode through the NHC decoder == the NCH decoder,
    and the cache PYTREES (shapes + values) stay identical — the worker's
    slot state is layout-agnostic by construction."""
    params = init_qwen3_codec(CFG, jax.random.key(0))
    codes = jnp.asarray(
        np.random.default_rng(7).integers(
            0, CFG.codebook_size, size=(2, CFG.num_quantizers, 8)),
        jnp.int32)

    monkeypatch.setenv("VOX_CODEC_NHC", "0")
    ref, ref_cache = _decode(params, codes, 2)
    monkeypatch.setenv("VOX_CODEC_NHC", "1")
    got, got_cache = _decode(params, codes, 2)

    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-5, rel
    ref_leaves = jax.tree.leaves(ref_cache)
    got_leaves = jax.tree.leaves(got_cache)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        assert a.shape == b.shape
        assert jnp.allclose(a, b, atol=1e-5)
