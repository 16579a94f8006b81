"""Minimal probe: where does the fused resunit kernel hang on TPU?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

t0 = time.monotonic()


def log(msg):
    print(f"[{time.monotonic() - t0:7.1f}s] {msg}", flush=True)


log(f"backend={jax.default_backend()} devices={jax.devices()}")

from scripts.drive_pallas_resunit import mk_units, xla_stack  # noqa: E402
from vox_serve_tpu.ops.pallas_resunit import fused_resunit_stack  # noqa: E402

B, C, T = (int(os.environ.get("B", "4")), int(os.environ.get("C", "768")),
           int(os.environ.get("T", "320")))
log(f"case B={B} C={C} T={T}")
key = jax.random.key(C)
units = mk_units(key, C, jnp.bfloat16)
x = (jax.random.normal(key, (B, C, T)) * 0.3).astype(jnp.bfloat16)
jax.block_until_ready(x)
log("inputs ready; lowering fused")
fused = jax.jit(lambda a: fused_resunit_stack(a, units, None)[0])
lowered = fused.lower(x)
log("lowered; compiling")
compiled = lowered.compile()
log("compiled; running")
got = jax.block_until_ready(compiled(x))
log(f"ran. out shape {got.shape}")
ref = jax.jit(lambda a: xla_stack(units, a))
want = jax.block_until_ready(ref(x))
rel = float(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max())
log(f"ref ran; abs err {rel}")
print("rc=0")
