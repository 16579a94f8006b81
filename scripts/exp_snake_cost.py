"""Is the codec residual unit sin-bound on the VPU?

Times, at the narrow-channel detok block shape, the XLA resunit chain with
(a) the real snake (jnp.sin), (b) snake replaced by a 2-op polynomial
(x + x*x) — same HBM traffic, no transcendental, (c) snake via fast
range-reduced sin^2 polynomial (the candidate fix), plus the isolated
snake chain. If (b) << (a), the 16.5 ms/unit cost is VPU transcendental
time, not HBM round-trips — and (c)'s gap to (b) is the poly's cost.

Run: python scripts/exp_snake_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vox_serve_tpu.codecs.layers import conv1d, init_conv1d

STEPS = 12
B, C, T = 80, 96, 19200
DILS = (1, 3, 9)


def time_chain(label, fn, x):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(x))
    y = x
    t0 = time.monotonic()
    for _ in range(STEPS):
        y = jfn(y)
    jax.block_until_ready(y)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>28}: {ms:8.2f} ms", flush=True)
    return ms


def snake_exact(x, a, b):
    xf = x.astype(jnp.float32)
    af = jnp.exp(a.astype(jnp.float32))[None, :, None]
    bi = 1.0 / (jnp.exp(b.astype(jnp.float32)) + 1e-9)[None, :, None]
    return (xf + bi * jnp.square(jnp.sin(xf * af))).astype(x.dtype)


def snake_cheap(x, a, b):
    xf = x.astype(jnp.float32)
    af = jnp.exp(a.astype(jnp.float32))[None, :, None]
    bi = 1.0 / (jnp.exp(b.astype(jnp.float32)) + 1e-9)[None, :, None]
    t = xf * af
    return (xf + bi * (t * t)).astype(x.dtype)


def sin2_fast(t):
    # sin^2 has period pi; reduce u = t - pi*round(t/pi) to [-pi/2, pi/2],
    # then sin^2(u) = u^2 * P(u^2) (Taylor, |err| < 3e-5 on the range)
    u = t - jnp.pi * jax.lax.round(t * (1.0 / jnp.pi))
    u2 = u * u
    p = 1.0 + u2 * (-1.0 / 3.0 + u2 * (2.0 / 45.0 + u2 * (-1.0 / 315.0)))
    return u2 * p


def snake_fast(x, a, b):
    xf = x.astype(jnp.float32)
    af = jnp.exp(a.astype(jnp.float32))[None, :, None]
    bi = 1.0 / (jnp.exp(b.astype(jnp.float32)) + 1e-9)[None, :, None]
    return (xf + bi * sin2_fast(xf * af)).astype(x.dtype)


def resunit_chain(snake, units, x):
    for u, dil in zip(units, DILS):
        y = snake(x, u["a1"], u["b1"])
        y = conv1d(u["c1"], y, dilation=dil, padding=(6 * dil, 0))
        y = snake(y, u["a2"], u["b2"])
        y = conv1d(u["c2"], y)
        x = x + y
    return x


def main():
    key = jax.random.key(0)
    dt = jnp.bfloat16
    units = []
    for i in range(3):
        ks = jax.random.split(jax.random.key(i), 6)
        units.append({
            "a1": jax.random.normal(ks[0], (C,), dt) * 0.2,
            "b1": jax.random.normal(ks[1], (C,), dt) * 0.2,
            "c1": jax.tree.map(lambda a: a.astype(dt),
                               init_conv1d(ks[2], C, C, 7)),
            "a2": jax.random.normal(ks[3], (C,), dt) * 0.2,
            "b2": jax.random.normal(ks[4], (C,), dt) * 0.2,
            "c2": jax.tree.map(lambda a: a.astype(dt),
                               init_conv1d(ks[5], C, C, 1)),
        })
    x = (jax.random.normal(key, (B, C, T)) * 0.5).astype(dt)

    u0 = units[0]
    time_chain("snake_exact x1", lambda a: snake_exact(a, u0["a1"], u0["b1"]), x)
    time_chain("snake_cheap x1", lambda a: snake_cheap(a, u0["a1"], u0["b1"]), x)
    time_chain("snake_fast  x1", lambda a: snake_fast(a, u0["a1"], u0["b1"]), x)
    t_e = time_chain("resunit3 exact-sin", lambda a: resunit_chain(snake_exact, units, a), x)
    t_c = time_chain("resunit3 cheap-poly", lambda a: resunit_chain(snake_cheap, units, a), x)
    t_f = time_chain("resunit3 fast-sin2", lambda a: resunit_chain(snake_fast, units, a), x)

    # numeric: fast vs exact
    ve = resunit_chain(snake_exact, units, x)
    vf = resunit_chain(snake_fast, units, x)
    err = jnp.abs(ve.astype(jnp.float32) - vf.astype(jnp.float32)).max()
    scale = jnp.abs(ve.astype(jnp.float32)).max()
    print(f"fast-vs-exact rel err: {float(err)/max(float(scale),1.0):.2e}")
    print(f"sin share of resunit: {(t_e - t_c) / t_e * 100:.0f}%  "
          f"fast recovers {(t_e - t_f) / max(t_e - t_c, 1e-9) * 100:.0f}%")
    print("rc=0")


if __name__ == "__main__":
    main()
