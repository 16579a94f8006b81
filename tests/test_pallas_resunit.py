"""Fused snake-resunit-stack kernel (ops/pallas_resunit.py) vs the XLA
path (codecs/qwen3_codec.py:_residual_unit chain), interpret mode."""

import jax
import jax.numpy as jnp
import pytest

from vox_serve_tpu.codecs.layers import init_conv1d
from vox_serve_tpu.codecs.qwen3_codec import _residual_unit
from vox_serve_tpu.ops.pallas_resunit import fused_resunit_stack

DILS = (1, 3, 9)


def _mk_units(key, C, dtype):
    units = []
    for dil in DILS:
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        units.append({
            "alpha1": jax.random.normal(k1, (C,)).astype(dtype) * 0.2,
            "beta1": jax.random.normal(k2, (C,)).astype(dtype) * 0.2,
            "conv1": jax.tree.map(lambda a: a.astype(dtype),
                                  init_conv1d(k3, C, C, 7)),
            "alpha2": jax.random.normal(k4, (C,)).astype(dtype) * 0.2,
            "beta2": jax.random.normal(k1, (C,)).astype(dtype) * 0.2,
            "conv2": jax.tree.map(lambda a: a.astype(dtype),
                                  init_conv1d(k2, C, C, 1)),
        })
    return units


def _xla_stack(units, x, caches):
    new = []
    for u, dil in zip(units, DILS):
        x, nc = _residual_unit(u, x, dil,
                               None if caches is None else caches.pop(0))
        new.append(nc)
    return x, new


@pytest.mark.parametrize("C", [96, 128])
def test_full_path_parity(C):
    """cache=None (zero halos) matches the XLA chain; C=96 exercises the
    128-lane zero-padding path."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, C, 160), jnp.float32) * 0.5
    units = _mk_units(key, C, jnp.float32)
    ref, _ = _xla_stack(units, x, None)
    out, ncs = fused_resunit_stack(x, units, None, interpret=True)
    assert ncs == [None, None, None]
    assert jnp.allclose(out, ref, atol=2e-5, rtol=1e-5), (
        float(jnp.abs(out - ref).max()))


def test_streaming_cache_parity():
    """Two chunks through the kernel == two chunks through the XLA path:
    outputs AND the snaked-tail caches (B, C, 6*dil) stay aligned."""
    key = jax.random.key(1)
    C = 96
    units = _mk_units(key, C, jnp.float32)
    x1 = jax.random.normal(key, (2, C, 128), jnp.float32) * 0.5
    x2 = jax.random.normal(jax.random.key(2), (2, C, 128), jnp.float32) * 0.5

    caches = [jnp.zeros((2, C, 6 * d), jnp.float32) for d in DILS]
    ref1, rc = _xla_stack(units, x1, list(caches))
    ref2, rc2 = _xla_stack(units, x2, list(rc))

    out1, kc = fused_resunit_stack(x1, units, caches, interpret=True)
    for a, b in zip(kc, rc):
        assert jnp.allclose(a, b, atol=2e-5), "chunk-1 caches diverge"
    out2, kc2 = fused_resunit_stack(x2, units, kc, interpret=True)
    assert jnp.allclose(out1, ref1, atol=2e-5, rtol=1e-5)
    assert jnp.allclose(out2, ref2, atol=3e-5, rtol=1e-5), (
        float(jnp.abs(out2 - ref2).max()))


def test_bf16_close():
    """bf16 serving dtype: kernel (f32 snake internals) tracks the XLA
    bf16 path within bf16 tolerance."""
    key = jax.random.key(3)
    C = 96
    units = _mk_units(key, C, jnp.bfloat16)
    x = jax.random.normal(key, (2, C, 160), jnp.bfloat16) * 0.5
    ref, _ = _xla_stack(units, x, None)
    out, _ = fused_resunit_stack(x, units, None, interpret=True)
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
    scale = jnp.abs(ref.astype(jnp.float32)).max()
    assert float(err.max()) / max(float(scale), 1.0) < 0.05


def test_streaming_equals_full():
    """Kernel chunked-with-cache == kernel full-with-zero-halo over the
    concatenation (the codec's chunk==full invariant)."""
    key = jax.random.key(4)
    C = 96
    units = _mk_units(key, C, jnp.float32)
    x = jax.random.normal(key, (1, C, 256), jnp.float32) * 0.5
    full, _ = fused_resunit_stack(x, units, None, interpret=True)
    caches = [jnp.zeros((1, C, 6 * d), jnp.float32) for d in DILS]
    o1, caches = fused_resunit_stack(x[..., :128], units, caches,
                                     interpret=True)
    o2, _ = fused_resunit_stack(x[..., 128:], units, caches, interpret=True)
    got = jnp.concatenate([o1, o2], axis=-1)
    assert jnp.allclose(got, full, atol=2e-5, rtol=1e-5), (
        float(jnp.abs(got - full).max()))
