"""Formulation experiment for the codec decoder's hot convs.

detok_profile_r4.json: the two narrow-channel decoder blocks are 75 ms of
the 103 ms detokenize call (c192 @ T6400: 31.9, c96 @ T19200: 42.8) at
~9-17% MXU utilization. This times equivalent formulations of the same
dilated causal conv1d on the TPU:

  nch       — current: lax.conv_general_dilated, ("NCH","OIH","NCH")
  nhc       — feature-minor conv: ("NHC","HIO","NHC") (TPU-native layout)
  nhc_pad   — nhc with channels zero-padded to 128 multiples
  shifted   — sum of k shifted (B*T, Cin) @ (Cin, Cout) matmuls (NHC)
  resunit   — the REAL residual-unit stack (snake+conv(d)+snake+conv1) in
              both layouts
  copy      — x+1 chain: HBM r/w roofline for the tensor size

Timing defeats the tunnel's result cache by CHAINING: y = f(y) STEPS times
(serial dependency, distinct values each step), one trailing
block_until_ready. Weights are scaled for ~unit gain so bf16 stays finite.

Run: python scripts/exp_conv_forms.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 16


def time_chain(label, fn, x, flops=None):
    fn = jax.jit(fn)
    y = fn(x)
    jax.block_until_ready(y)  # compile
    y = x
    t0 = time.monotonic()
    for _ in range(STEPS):
        y = fn(y)
    jax.block_until_ready(y)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    extra = ""
    if flops:
        extra = f"  ({flops / ms / 1e9:7.1f} TFLOP/s)"
    print(f"{label:>24}: {ms:8.2f} ms{extra}", flush=True)
    return ms


def run_case(B, C, T, k=7, dil=1):
    print(f"--- B={B} C={C} T={T} k={k} dil={dil}")
    key = jax.random.key(0)
    scale = float(1.0 / np.sqrt(k * C))  # ~unit gain for the chain
    x_nch = jax.random.normal(key, (B, C, T), jnp.bfloat16)
    x_nhc = jnp.swapaxes(x_nch, 1, 2)
    w_oik = (jax.random.normal(key, (C, C, k), jnp.bfloat16) * scale)
    w_kio = jnp.transpose(w_oik, (2, 1, 0))  # (k, in, out) for NHC
    pad = (k - 1) * dil
    flops = 2.0 * B * C * C * k * T  # MAC*2

    def nch(x):
        return jax.lax.conv_general_dilated(
            x, w_oik, window_strides=(1,), padding=((pad, 0),),
            rhs_dilation=(dil,), dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def nhc(x):
        return jax.lax.conv_general_dilated(
            x, w_kio, window_strides=(1,), padding=((pad, 0),),
            rhs_dilation=(dil,), dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def shifted(x):  # (B, T, C): sum_k shift(x, k*dil) @ w[k]
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        out = jnp.zeros((B, T, C), jnp.float32)
        for kk in range(k):
            seg = jax.lax.dynamic_slice_in_dim(xp, kk * dil, T, axis=1)
            out = out + seg @ w_kio[kk]
        return out.astype(x.dtype)

    time_chain("copy roofline", lambda x: x + 1, x_nch)
    time_chain("nch (current)", nch, x_nch, flops)
    time_chain("nhc", nhc, x_nhc, flops)
    time_chain("shifted matmuls", shifted, x_nhc, flops)

    if C % 128:
        Cp = ((C + 127) // 128) * 128
        xp_nhc = jnp.pad(x_nhc, ((0, 0), (0, 0), (0, Cp - C)))
        wp = jnp.zeros((k, Cp, Cp), jnp.bfloat16).at[:, :C, :C].set(w_kio)

        def nhc_pad(x):
            return jax.lax.conv_general_dilated(
                x, wp, window_strides=(1,), padding=((pad, 0),),
                rhs_dilation=(dil,), dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32).astype(x.dtype)

        time_chain(f"nhc padded C={Cp}", nhc_pad, xp_nhc,
                   2.0 * B * Cp * Cp * k * T)


def run_resunit(B, C, T, k=7):
    """The real _residual_unit stack: snake+conv(k7,d1)+snake+conv(k1),
    NCH (current) vs NHC layout."""
    print(f"--- resunit B={B} C={C} T={T}")
    key = jax.random.key(1)
    scale = float(1.0 / np.sqrt(k * C))
    w1 = jax.random.normal(key, (C, C, k), jnp.bfloat16) * scale
    w2 = jax.random.normal(key, (C, C, 1), jnp.bfloat16) / float(np.sqrt(C))
    alpha = jnp.zeros((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    x_nch = jax.random.normal(key, (B, C, T), jnp.bfloat16)
    flops = 2.0 * B * C * C * (k + 1) * T

    def snake_nch(x, a, b):
        af = jnp.exp(a)[None, :, None]
        bf = jnp.exp(b)[None, :, None]
        y = x + (1.0 / (bf + 1e-9)) * jnp.square(jnp.sin(x * af))
        return y.astype(x.dtype)

    def ru_nch(x):
        y = snake_nch(x, alpha, beta)
        y = jax.lax.conv_general_dilated(
            y, w1, window_strides=(1,), padding=(((k - 1), 0),),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = snake_nch(y, alpha, beta)
        y = jax.lax.conv_general_dilated(
            y, w2, window_strides=(1,), padding=((0, 0),),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        return x + y

    w1_kio = jnp.transpose(w1, (2, 1, 0))
    w2_io = w2[:, :, 0].T  # (in, out)

    def snake_nhc(x, a, b):
        af = jnp.exp(a)[None, None, :]
        bf = jnp.exp(b)[None, None, :]
        y = x + (1.0 / (bf + 1e-9)) * jnp.square(jnp.sin(x * af))
        return y.astype(x.dtype)

    def ru_nhc(x):
        y = snake_nhc(x, alpha, beta)
        y = jax.lax.conv_general_dilated(
            y, w1_kio, window_strides=(1,), padding=(((k - 1), 0),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = snake_nhc(y, alpha, beta)
        y = (y @ w2_io).astype(x.dtype)
        return x + y

    time_chain("resunit nch", ru_nch, x_nch, flops)
    time_chain("resunit nhc", ru_nhc, jnp.swapaxes(x_nch, 1, 2), flops)


if __name__ == "__main__":
    # the two hot blocks from artifacts/detok_profile_r4.json
    run_case(80, 96, 19200, k=7, dil=1)
    run_case(80, 96, 19200, k=7, dil=9)
    run_case(80, 192, 6400, k=7, dil=1)
    # the wide early block for contrast (fast today)
    run_case(80, 768, 320, k=7, dil=1)
    run_resunit(80, 96, 19200)
    run_resunit(80, 192, 6400)
    print("rc=0")
