"""Codec-integration parity for the fused Pallas resunit stack: the full
Qwen3 codec streaming decode (codecs/qwen3_codec.py:_pipeline) with
VOX_FUSED_RESUNIT=1 (interpret mode on CPU) must match the XLA path
chunk-for-chunk, caches included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.qwen3_codec import (
    Qwen3CodecConfig, init_qwen3_codec, qwen3_codec_decode_chunk,
    qwen3_codec_init_cache,
)

CFG = Qwen3CodecConfig(
    codebook_dim=64, codebook_size=64, latent_dim=96, decoder_dim=192,
    hidden_size=64, intermediate_size=96, head_dim=32, num_heads=2,
    num_kv_heads=2, num_layers=2, num_quantizers=4, sliding_window=16,
    vq_dim=32,
)


def _decode(params, codes):
    cache = qwen3_codec_init_cache(CFG, codes.shape[0])
    outs = []
    for s in range(0, codes.shape[-1], 4):
        wav, cache = qwen3_codec_decode_chunk(
            params, CFG, codes[:, :, s:s + 4], cache)
        outs.append(np.asarray(wav))
    return np.concatenate(outs, axis=-1)


@pytest.mark.slow
def test_fused_resunit_in_codec_pipeline(monkeypatch):
    params = init_qwen3_codec(CFG, jax.random.key(0))
    codes = jnp.asarray(
        np.random.default_rng(5).integers(
            0, CFG.codebook_size, size=(1, CFG.num_quantizers, 8)),
        jnp.int32)

    monkeypatch.setenv("VOX_FUSED_RESUNIT", "0")
    ref = _decode(params, codes)
    monkeypatch.setenv("VOX_FUSED_RESUNIT", "1")
    got = _decode(params, codes)

    assert got.shape == ref.shape == (1, 1, 8 * CFG.samples_per_frame)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel
