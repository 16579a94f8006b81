"""Formulation experiment for the codec decoder's hot convs.

detok_profile_r4.json: the two narrow-channel decoder blocks are 75 ms of
the 103 ms detokenize call (c192 @ T6400: 31.9, c96 @ T19200: 42.8) at
~9-17% MXU utilization. This times equivalent formulations of the same
dilated causal conv1d on the TPU:

  nch      — current: lax.conv_general_dilated, ("NCH","OIH","NCH")
  nhc      — feature-minor conv: ("NHC","HIO","NHC") (TPU-native layout)
  shifted  — sum of k shifted (T, Cin) @ (Cin, Cout) matmuls
  nhc_pad  — nhc with channels zero-padded to 128 multiples (exact: zero
             channels stay zero through conv+bias0)

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

STEPS = 20


def timeit(label, fn, *args):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    out = None
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>28}: {ms:8.2f} ms", flush=True)
    return ms


def run_case(B, C, T, k=7, dil=1):
    print(f"--- B={B} C={C} T={T} k={k} dil={dil}")
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, C, T), jnp.bfloat16)
    w = jax.random.normal(key, (C, C, k), jnp.bfloat16) * 0.05
    pad = (k - 1) * dil

    def nch(x, w):
        return jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (0, 0), (pad, 0))), w, (1,), ((0, 0),),
            rhs_dilation=(dil,), dimension_numbers=("NCH", "OIH", "NCH"))

    r_nch = timeit("nch (current)", nch, x, w)

    xh = x.transpose(0, 2, 1)  # (B, T, C)
    wh = w.transpose(2, 1, 0)  # (k, Cin, Cout)

    def nhc(xh, wh):
        return jax.lax.conv_general_dilated(
            jnp.pad(xh, ((0, 0), (pad, 0), (0, 0))), wh, (1,), ((0, 0),),
            rhs_dilation=(dil,), dimension_numbers=("NHC", "HIO", "NHC"))

    timeit("nhc", nhc, xh, wh)

    def shifted(xh, wh):
        xp = jnp.pad(xh, ((0, 0), (pad, 0), (0, 0)))
        out = jnp.zeros((B, T, C), jnp.float32)
        for j in range(k):
            seg = jax.lax.dynamic_slice_in_dim(xp, j * dil, T, axis=1)
            out = out + seg @ wh[j].astype(jnp.float32)
        return out.astype(jnp.bfloat16)

    timeit("shifted matmuls", shifted, xh, wh)

    Cp = ((C + 127) // 128) * 128
    xp_ = jnp.pad(xh, ((0, 0), (0, 0), (0, Cp - C)))
    wp_ = jnp.pad(wh, ((0, 0), (0, Cp - C), (0, Cp - C)))

    def nhc_pad(xp_, wp_):
        return jax.lax.conv_general_dilated(
            jnp.pad(xp_, ((0, 0), (pad, 0), (0, 0))), wp_, (1,), ((0, 0),),
            rhs_dilation=(dil,), dimension_numbers=("NHC", "HIO", "NHC"))

    timeit(f"nhc padded C={Cp}", nhc_pad, xp_, wp_)

    flops = B * T * k * C * C * 2
    print(f"    ({flops / 1e9:.1f} GFLOP; nch = "
          f"{flops / (r_nch / 1e3) / 1e12:.1f} TFLOP/s)")


def main():
    run_case(80, 96, 19200)
    run_case(80, 96, 19200, dil=9)
    run_case(80, 192, 6400)
    run_case(80, 768, 320)


if __name__ == "__main__":
    main()
