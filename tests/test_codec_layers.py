"""Parity of JAX codec conv primitives vs torch CPU."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from vox_serve_tpu.codecs.layers import (
    avg_pool1d, conv1d, conv_transpose1d, fold_weight_norm, snake,
)


def _to_params(mod):
    p = {"w": jnp.asarray(mod.weight.detach().numpy())}
    if mod.bias is not None:
        p["b"] = jnp.asarray(mod.bias.detach().numpy())
    return p


@pytest.mark.parametrize("stride,padding,dilation,groups,k", [
    (1, 3, 1, 1, 7),
    (2, 1, 1, 1, 4),
    (1, 9, 3, 1, 7),
    (1, 3, 1, 4, 7),     # depthwise-ish
    (4, 2, 1, 1, 8),
])
def test_conv1d_matches_torch(stride, padding, dilation, groups, k):
    torch.manual_seed(0)
    cin, cout, T = 8, 12, 64
    m = nn.Conv1d(cin, cout, k, stride=stride, padding=padding,
                  dilation=dilation, groups=groups if cin % groups == 0 and cout % groups == 0 else 1)
    g = m.groups
    x = torch.randn(2, cin, T)
    ref = m(x).detach().numpy()
    out = conv1d(_to_params(m), jnp.asarray(x.numpy()), stride=stride,
                 padding=padding, dilation=dilation, groups=g)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding,output_padding,groups,k", [
    (2, 1, 0, 1, 4),
    (8, 4, 0, 1, 16),
    (7, 4, 1, 1, 14),    # odd stride: padding=ceil(7/2)=4, output_padding=1
    (2, 1, 0, 2, 4),
])
def test_conv_transpose1d_matches_torch(stride, padding, output_padding,
                                        groups, k):
    torch.manual_seed(1)
    cin, cout, T = 8, 12, 32
    m = nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=padding,
                           output_padding=output_padding, groups=groups)
    x = torch.randn(2, cin, T)
    ref = m(x).detach().numpy()
    out = conv_transpose1d(_to_params(m), jnp.asarray(x.numpy()),
                           stride=stride, padding=padding,
                           output_padding=output_padding, groups=groups)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_snake_matches_reference_formula():
    x = np.random.RandomState(0).randn(2, 4, 16).astype(np.float32)
    alpha = np.abs(np.random.RandomState(1).randn(1, 4, 1).astype(np.float32))
    ref = x + (1.0 / (alpha + 1e-9)) * np.sin(alpha * x) ** 2
    out = snake(jnp.asarray(x), jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_avg_pool1d_matches_torch():
    x = torch.randn(2, 4, 33)
    ref = torch.nn.functional.avg_pool1d(x, 4, 4).numpy()
    out = avg_pool1d(jnp.asarray(x.numpy()), 4, 4)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_fold_weight_norm_matches_torch():
    torch.manual_seed(2)
    m = torch.nn.utils.weight_norm(nn.Conv1d(4, 8, 5))
    w_eff = m.weight.detach().numpy()  # torch computes g * v/||v||
    g = m.weight_g.detach().numpy()
    v = m.weight_v.detach().numpy()
    folded = fold_weight_norm(g, v)
    np.testing.assert_allclose(folded, w_eff, rtol=1e-5, atol=1e-6)
