"""Streaming HiFT: chunked decode with mel/source/speech caches must track
the offline decode (modulo the ctx-frame delay) and beat cache-less chunking.

Covers VERDICT weak #1: the per-slot HiFT cache is now threaded through all
flow+HiFT models (reference HiFTGeneratorCache, cosyvoice2.py:1050-1075).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.codecs.hifigan import (HiFTConfig, hift_decode,
                                          hift_decode_chunk, init_hift,
                                          init_hift_cache)

CFG = HiFTConfig(in_channels=16, base_channels=32, nb_harmonics=2,
                 upsample_rates=(8, 5, 3), upsample_kernel_sizes=(16, 11, 7),
                 f0_cond_channels=16)


def _rel_err(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def test_chunked_tracks_full_decode():
    params = init_hift(CFG, jax.random.key(0))
    up = CFG.total_upsample
    ctx = 6
    T, chunk = 24, 8
    mel = jax.random.normal(jax.random.key(1), (1, CFG.in_channels, T))

    full, _ = hift_decode(params, CFG, mel)
    full = np.asarray(full)

    cache = init_hift_cache(CFG, 1, ctx_frames=ctx)
    outs = []
    for c0 in range(0, T, chunk):
        wav, cache = hift_decode_chunk(params, CFG, mel[:, :, c0:c0 + chunk],
                                       cache)
        assert wav.shape == (1, chunk * up)
        outs.append(np.asarray(wav))
    chunked = np.concatenate(outs, axis=1)

    # stream is delayed by ctx frames: chunked[n] ~ full[n - ctx*up]
    d = ctx * up
    aligned = chunked[:, d:]
    target = full[:, : aligned.shape[1]]
    err_cached = _rel_err(aligned, target)

    # cache-less chunking (fresh zero caches every chunk) must be worse
    outs_nc = []
    for c0 in range(0, T, chunk):
        wav, _ = hift_decode_chunk(params, CFG, mel[:, :, c0:c0 + chunk],
                                   init_hift_cache(CFG, 1, ctx_frames=ctx))
        outs_nc.append(np.asarray(wav))
    err_fresh = _rel_err(np.concatenate(outs_nc, axis=1)[:, d:], target)

    assert err_cached < 0.5, err_cached
    assert err_cached < err_fresh, (err_cached, err_fresh)


def test_cache_shapes_stable():
    params = init_hift(CFG, jax.random.key(0))
    cache = init_hift_cache(CFG, 2)
    shapes = jax.tree.map(lambda a: a.shape, cache)
    mel = jnp.zeros((2, CFG.in_channels, 10))
    wav, new_cache = hift_decode_chunk(params, CFG, mel, cache)
    assert jax.tree.map(lambda a: a.shape, new_cache) == shapes
    assert wav.shape == (2, 10 * CFG.total_upsample)
