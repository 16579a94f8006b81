"""Decide the CSM attention fix: time the fold kernel vs the padded-D128
combined ragged kernel INSIDE one 16-layer jit (like the real decode
step), not as separate dispatches.

Isolated per-call probes (scripts/exp_ragged_sweep.py) showed ~4 ms/call
for EVERY shape — including the Qwen3 shape whose in-step cost is
measured at ~0.5 ms/layer — so per-dispatch overhead (scalar-prefetch
upload through the tunnel) swamps them. This probe mimics the worker's
step: one jitted function running L=16 attention calls chained through q,
with per-layer pools, timed as a whole.

In-step baselines (artifacts/decode_profile_csm_r4.json, B=64 W=24):
full-step attention share = 94.5 ms (fold kernel, head-major pair pools).

Run: python scripts/exp_attn_inloop.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, KH, D = 64, 32, 8, 64
L = 16
SEQ = 300
PAGE = 16
WIDTH = 24
P = 1536
STEPS = 12


def mk_meta():
    from vox_serve_tpu.ops.attention import AttnMetadata

    pages_per_seq = SEQ // PAGE + 1
    tables = np.zeros((B, WIDTH), np.int32)
    for i in range(B):
        base = (i * pages_per_seq) % (P - pages_per_seq - 1)
        tables[i, :pages_per_seq] = np.arange(base, base + pages_per_seq)
    zero = jnp.zeros((B,), jnp.int32)
    return AttnMetadata(
        is_prefill=False, kv_page_ids=zero, kv_page_offsets=zero,
        block_tables=jnp.asarray(tables),
        seq_lens=jnp.full((B,), SEQ, jnp.int32))


def time_step(label, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.monotonic()
    jax.block_until_ready(jfn(*args))
    compile_s = time.monotonic() - t0
    y = args[0]
    t0 = time.monotonic()
    for _ in range(STEPS):
        y = jfn(y, *args[1:])
    jax.block_until_ready(y)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>14}: {ms:8.2f} ms / {L}-layer step   "
          f"({ms / L:6.3f} ms/layer; compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    meta = mk_meta()
    scale = 1.0 / (D ** 0.5)
    key = jax.random.key(0)
    q0 = (jax.random.normal(key, (B, H, D)) * 0.1).astype(jnp.bfloat16)

    # ---- fold kernel on the head-major pair pools (current CSM path)
    from vox_serve_tpu.ops.pallas_attention import (
        pallas_paged_attention_decode,
    )

    kp = (jax.random.normal(jax.random.key(1), (L, KH, P, PAGE, D)) * 0.1
          ).astype(jnp.bfloat16)
    vp = (jax.random.normal(jax.random.key(2), (L, KH, P, PAGE, D)) * 0.1
          ).astype(jnp.bfloat16)

    def fold_step(q, kp, vp):
        for layer in range(L):
            o = pallas_paged_attention_decode(q, kp, vp, layer, meta,
                                              scale=scale)
            q = (q + o).astype(q.dtype) * 0.7
        return q

    time_step("fold_legacy", fold_step, q0, kp, vp)

    # ---- stock ragged kernel, combined pool, D padded to 128
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention,
    )

    pool = (jax.random.normal(jax.random.key(3), (L * P, PAGE, 2 * KH, 128))
            * 0.1).astype(jnp.bfloat16)
    cu_q = jnp.arange(B + 1, dtype=jnp.int32)
    num_seqs = jnp.array([B], jnp.int32)

    def ragged_step(q, pool):
        for layer in range(L):
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, 128 - D)))
            o = ragged_paged_attention(
                qp, pool, meta.seq_lens,
                meta.block_tables + jnp.int32(layer) * P, cu_q, num_seqs,
                sm_scale=scale,
                vmem_limit_bytes=64 * 1024 * 1024)[..., :D]
            q = (q + o).astype(q.dtype) * 0.7
        return q

    time_step("ragged_d128", ragged_step, q0, pool)

    # ---- gather fallback control (reads the padded table densely)
    from vox_serve_tpu.ops.attention import paged_attention_decode

    def gather_step(q, kp, vp):
        for layer in range(L):
            o = paged_attention_decode(q, kp, vp, layer, meta, scale=scale,
                                       use_pallas=False)
            q = (q + o).astype(q.dtype) * 0.7
        return q

    time_step("gather", gather_step, q0, kp, vp)
    print("rc=0")


if __name__ == "__main__":
    main()
