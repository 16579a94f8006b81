"""Channel-padded (128-lane) XLA resunit chain vs current NHC — TPU A/B.

Hypothesis (r5): in NHC layout the channel axis is the TPU lane axis,
which XLA pads to multiples of 128 in registers AND in HBM tiling — so a
C=96 resunit already spends 128 lanes of VPU sin and 128-lane memory
tiles. Zero-padding the WEIGHTS to C=128 (alpha lanes -> exp(alpha)=1,
harmless on zero activations: snake(0)=0) therefore costs nothing and
lets the convs contract over a full 128 MXU dimension (measured 5.87 ->
5.06 ms on the bare conv, artifacts/conv_forms_r4.md). The r4 negative
result (artifacts/pallas_resunit_tpu.md) was the hand-fused PALLAS
kernel; the XLA-padded path was never measured.

Run: python scripts/exp_resunit_pad.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.codecs.layers import init_conv1d

STEPS = 12
B = 80
DILS = (1, 3, 9)


def snake_nhc(x, a, b):
    af = jnp.exp(a.astype(jnp.float32))[None, None, :]
    bi = 1.0 / (jnp.exp(b.astype(jnp.float32)) + 1e-9)[None, None, :]
    xf = x.astype(jnp.float32)
    return (xf + bi * jnp.square(jnp.sin(xf * af))).astype(x.dtype)


def conv_nhc(p, x, dilation=1):
    # weights (Cout, Cin, K) -> lax conv NHC
    w = p["w"].transpose(2, 1, 0)  # (K, Cin, Cout)
    pad = (p["w"].shape[-1] - 1) * dilation
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["b"][None, None, :]


def resunit_chain(units, x):
    for u, dil in zip(units, DILS):
        y = snake_nhc(x, u["a1"], u["b1"])
        y = conv_nhc(u["c1"], y, dilation=dil)
        y = snake_nhc(y, u["a2"], u["b2"])
        y = conv_nhc(u["c2"], y)
        x = x + y
    return x


def make_units(C, dt, pad_to=None):
    units = []
    for i in range(3):
        ks = jax.random.split(jax.random.key(i), 6)
        u = {
            "a1": jax.random.normal(ks[0], (C,), dt) * 0.2,
            "b1": jax.random.normal(ks[1], (C,), dt) * 0.2,
            "c1": jax.tree.map(lambda a: a.astype(dt),
                               init_conv1d(ks[2], C, C, 7)),
            "a2": jax.random.normal(ks[3], (C,), dt) * 0.2,
            "b2": jax.random.normal(ks[4], (C,), dt) * 0.2,
            "c2": jax.tree.map(lambda a: a.astype(dt),
                               init_conv1d(ks[5], C, C, 1)),
        }
        if pad_to:
            P = pad_to - C
            # snake pad lanes: exp(very negative beta) -> 1/b blows up; use
            # 0 (exp(0)=1) so pad lanes compute 0 + 1*sin^2(0) = 0 exactly
            u["a1"] = jnp.pad(u["a1"], (0, P))
            u["b1"] = jnp.pad(u["b1"], (0, P))
            u["a2"] = jnp.pad(u["a2"], (0, P))
            u["b2"] = jnp.pad(u["b2"], (0, P))
            for c in ("c1", "c2"):
                u[c] = {"w": jnp.pad(u[c]["w"], ((0, P), (0, P), (0, 0))),
                        "b": jnp.pad(u[c]["b"], (0, P))}
        units.append(u)
    return units


def timed(label, fn, x):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(x))
    t0 = time.monotonic()
    y = x
    for _ in range(STEPS):
        y = jfn(y)
    jax.block_until_ready(y)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>34}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    dt = jnp.bfloat16
    out = {}
    for C, T, CP in ((96, 19200, 128), (192, 6400, 256)):
        print(f"--- resunit3 chain B={B} C={C} T={T}")
        x = (jax.random.normal(jax.random.key(9), (B, T, C)) * 0.5).astype(dt)
        units = make_units(C, dt)
        base = timed(f"nhc C={C}", lambda a, u=units: resunit_chain(u, a), x)
        unitsp = make_units(C, dt, pad_to=CP)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, CP - C)))
        padded = timed(f"nhc padded C={CP}",
                       lambda a, u=unitsp: resunit_chain(u, a), xp)
        # parity: padded chain == base chain on the real lanes
        yb = np.asarray(resunit_chain(units, x).astype(jnp.float32))
        yp = np.asarray(resunit_chain(unitsp, xp).astype(jnp.float32))
        err = np.abs(yp[..., :C] - yb).max() / max(np.abs(yb).max(), 1e-6)
        pad_leak = np.abs(yp[..., C:]).max()
        print(f"  rel_err={err:.2e} pad_leak={pad_leak:.2e} "
              f"speedup={base / padded:.3f}x", flush=True)
        out[C] = {"base_ms": round(base, 2), "padded_ms": round(padded, 2),
                  "speedup": round(base / padded, 3),
                  "rel_err": float(err)}
    import json
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "resunit_pad_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
