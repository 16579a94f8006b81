import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.watermark import (
    SILENTCIPHER_KEY, WatermarkConfig, apply_watermark, detect_watermark,
    init_watermarker,
)


def test_watermark_roundtrip_detectable_and_transparent():
    cfg = WatermarkConfig()
    params = init_watermarker(cfg, jax.random.key(0))
    audio = 0.3 * jnp.sin(
        2 * jnp.pi * 220.0 * jnp.arange(24000) / 24000.0)[None, :]
    audio = jnp.tile(audio, (2, 1))
    marked = apply_watermark(params, cfg, audio)
    assert marked.shape == audio.shape
    # transparency: small perturbation
    err = np.abs(np.asarray(marked - audio)).max()
    assert err < 0.05
    # detectability: watermarked scores well above clean
    s_marked = np.asarray(detect_watermark(params, cfg, marked))
    s_clean = np.asarray(detect_watermark(params, cfg, audio))
    assert np.all(s_marked > s_clean + 1e-4)


def test_watermark_jits():
    cfg = WatermarkConfig(style="perth")
    params = init_watermarker(cfg, jax.random.key(1))
    fn = jax.jit(lambda a: apply_watermark(params, cfg, a))
    out = fn(jnp.zeros((1, 4096)))
    assert out.shape == (1, 4096)


def test_fixed_key_matches_reference():
    assert SILENTCIPHER_KEY == (11, 91, 60, 147, 209)
