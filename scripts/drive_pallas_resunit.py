"""Real-TPU validation + timing of the fused resunit stack
(ops/pallas_resunit.py): parity vs the XLA chain at the four detok block
shapes, then chained timing. Writes artifacts/pallas_resunit_tpu.json.

Result (2026-08-19, artifacts/pallas_resunit_tpu.md): NEGATIVE — the
kernel loses 0.91-0.93x at the narrow blocks it targeted and diverges
numerically at C=96 on hardware; the stack is VPU-sin-bound
(scripts/exp_snake_cost.py), so the saved HBM traffic doesn't pay.

Run: python scripts/drive_pallas_resunit.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vox_serve_tpu.codecs.layers import init_conv1d
from vox_serve_tpu.codecs.qwen3_codec import _residual_unit
from vox_serve_tpu.ops.pallas_resunit import fused_resunit_stack

DILS = (1, 3, 9)
STEPS = 12
# the four decoder blocks at the B=80 detok bucket, 10-frame window
CASES = [  # (C, T)
    (768, 320),
    (384, 1600),
    (192, 6400),
    (96, 19200),
]


def mk_units(key, C, dtype):
    units = []
    for _ in DILS:
        key, k1, k2, k3 = jax.random.split(key, 4)
        units.append({
            "alpha1": (jax.random.normal(k1, (C,)) * 0.2).astype(dtype),
            "beta1": (jax.random.normal(k2, (C,)) * 0.2).astype(dtype),
            "conv1": jax.tree.map(lambda a: a.astype(dtype),
                                  init_conv1d(k3, C, C, 7)),
            "alpha2": (jax.random.normal(k2, (C,)) * 0.2).astype(dtype),
            "beta2": (jax.random.normal(k3, (C,)) * 0.2).astype(dtype),
            "conv2": jax.tree.map(lambda a: a.astype(dtype),
                                  init_conv1d(k1, C, C, 1)),
        })
    return units


def xla_stack(units, x):
    for u, dil in zip(units, DILS):
        x, _ = _residual_unit(u, x, dil, None)
    return x


def time_chain(jfn, x):
    # jfn must already be compiled (warm); chained calls defeat the
    # tunnel's result cache for identical executions
    y = x
    t0 = time.monotonic()
    for _ in range(STEPS):
        y = jfn(y)
    jax.block_until_ready(y)
    return (time.monotonic() - t0) / STEPS * 1e3


def main():
    B = 80
    t0 = time.monotonic()
    results = []
    for C, T in CASES:
        key = jax.random.key(C)
        units = mk_units(key, C, jnp.bfloat16)
        x = (jax.random.normal(key, (B, C, T)) * 0.3).astype(jnp.bfloat16)

        fused = jax.jit(lambda a: fused_resunit_stack(a, units, None)[0])
        ref = jax.jit(lambda a: xla_stack(units, a))
        got = jax.block_until_ready(fused(x))
        print(f"[{time.monotonic()-t0:6.1f}s] C={C} fused compiled",
              flush=True)
        want = jax.block_until_ready(ref(x))
        print(f"[{time.monotonic()-t0:6.1f}s] C={C} ref compiled", flush=True)
        err = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))
        scale = float(jnp.abs(want.astype(jnp.float32)).max())
        rel = float(err.max()) / max(scale, 1.0)
        t_fused = time_chain(fused, x)
        t_xla = time_chain(ref, x)
        row = {"C": C, "T": T, "B": B, "max_rel_err": round(rel, 5),
               "fused_ms": round(t_fused, 2), "xla_ms": round(t_xla, 2),
               "speedup": round(t_xla / t_fused, 2)}
        print(row, flush=True)
        if rel >= 0.05:
            print(f"PARITY FAIL at C={C}: {rel}", flush=True)
        results.append(row)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "pallas_resunit_tpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("rc=0")


if __name__ == "__main__":
    main()
