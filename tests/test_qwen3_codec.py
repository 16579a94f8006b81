"""Qwen3 codec: streaming chunked decode must equal full decode (the oracle
for every conv / trans-conv / attention cache)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.qwen3_codec import (
    Qwen3CodecConfig, init_qwen3_codec, qwen3_codec_decode,
    qwen3_codec_decode_chunk, qwen3_codec_init_cache,
)

# small config (same structure, fewer/smaller layers) for CPU tests
SMALL = Qwen3CodecConfig(
    codebook_dim=32, codebook_size=64, latent_dim=48, decoder_dim=64,
    hidden_size=32, intermediate_size=64, head_dim=16, num_heads=4,
    num_kv_heads=4, num_layers=2, num_quantizers=16, sliding_window=6,
    upsample_rates=(4, 3), upsampling_ratios=(2, 2), vq_dim=16,
)


@pytest.fixture(scope="module")
def setup():
    params = init_qwen3_codec(SMALL, jax.random.key(0))
    codes = jax.random.randint(jax.random.key(1), (2, 16, 12), 0, 64)
    return params, codes


def test_full_decode_shape(setup):
    params, codes = setup
    wav = qwen3_codec_decode(params, SMALL, codes)
    assert wav.shape == (2, 1, 12 * SMALL.samples_per_frame)
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)


def test_chunked_equals_full(setup):
    params, codes = setup
    full = np.asarray(qwen3_codec_decode(params, SMALL, codes))
    cache = qwen3_codec_init_cache(SMALL, 2)
    outs = []
    for s in range(0, 12, 3):  # 4 chunks of 3 frames
        wav, cache = qwen3_codec_decode_chunk(params, SMALL,
                                              codes[:, :, s:s + 3], cache)
        outs.append(np.asarray(wav))
    chunked = np.concatenate(outs, axis=-1)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-4)


def test_chunked_crosses_sliding_window(setup):
    """More frames than the attention window: rolling KV must still match the
    full decode (which uses the dense sliding-window mask)."""
    params, _ = setup
    codes = jax.random.randint(jax.random.key(3), (1, 16, 18), 0, 64)
    full = np.asarray(qwen3_codec_decode(params, SMALL, codes))
    cache = qwen3_codec_init_cache(SMALL, 1)
    outs = []
    for s in range(0, 18, 2):
        wav, cache = qwen3_codec_decode_chunk(params, SMALL,
                                              codes[:, :, s:s + 2], cache)
        outs.append(np.asarray(wav))
    chunked = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-4)


def test_cache_is_jit_compatible(setup):
    params, codes = setup
    cache = qwen3_codec_init_cache(SMALL, 2)

    @jax.jit
    def step(codes, cache):
        return qwen3_codec_decode_chunk(params, SMALL, codes, cache)

    wav, cache = step(codes[:, :, :3], cache)
    wav2, cache = step(codes[:, :, 3:6], cache)
    assert wav.shape == wav2.shape
