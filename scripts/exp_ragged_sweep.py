"""Why is ragged_paged_attention ~3.3 ms/layer at CSM's decode shape
(B=64, KH=8, D=64->128, page 16, W=24) when the same kernel runs the
Qwen3 flagship at ~0.4-1.6 ms/layer with MORE data (B=144)?

The kernel's own tuning table warns pages_per_seq > MAX_PAGES_PER_SEQ=16
spills SREGs (tuned_block_sizes.py:21-22), and W=24 exceeds it. Sweep:
  - page size 16 (W=24) vs 32 (W=12)  [same KV bytes]
  - num_kv_pages_per_block 4/8/16
  - B=64 vs 144, H=32 vs 16 controls

Run: python scripts/exp_ragged_sweep.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

KH, D = 8, 128
SEQ = 300
STEPS = 12


def run(label, B, H, page, width, bkv=None, pool_pages=1536):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention,
    )

    pages_per_seq = SEQ // page + 1
    tables = np.zeros((B, width), np.int32)
    for i in range(B):
        base = (i * pages_per_seq) % (pool_pages - pages_per_seq - 1)
        tables[i, :pages_per_seq] = np.arange(base, base + pages_per_seq)
    tables = jnp.asarray(tables)
    seq_lens = jnp.full((B,), SEQ, jnp.int32)
    cu_q = jnp.arange(B + 1, dtype=jnp.int32)
    num_seqs = jnp.array([B], jnp.int32)
    scale = 1.0 / (D ** 0.5)

    q = (jax.random.normal(jax.random.key(0), (B, H, D)) * 0.1
         ).astype(jnp.bfloat16)
    pool = (jax.random.normal(jax.random.key(1),
                              (pool_pages, page, 2 * KH, D)) * 0.1
            ).astype(jnp.bfloat16)

    def fn(q, pool):
        return ragged_paged_attention(
            q, pool, seq_lens, tables, cu_q, num_seqs, sm_scale=scale,
            num_kv_pages_per_block=bkv,
            vmem_limit_bytes=64 * 1024 * 1024)

    jfn = jax.jit(fn)
    try:
        jax.block_until_ready(jfn(q, pool))
    except Exception as e:  # pragma: no cover - probe
        print(f"{label:>28}: FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return
    y = q
    t0 = time.monotonic()
    for _ in range(STEPS):
        y = jfn(y, pool)
    jax.block_until_ready(y)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>28}: {ms:7.3f} ms/layer", flush=True)
    return ms


def main():
    # baseline: CSM shape as served today
    run("B64 H32 page16 W24", 64, 32, 16, 24)
    # block-size sweep at the served shape
    for bkv in (4, 8, 16):
        run(f"B64 H32 page16 W24 bkv{bkv}", 64, 32, 16, 24, bkv=bkv)
    # page 32: pages_per_seq 10 <= 16 (no SREG spill), W=12
    run("B64 H32 page32 W12", 64, 32, 32, 12, pool_pages=768)
    run("B64 H32 page32 W12 bkv4", 64, 32, 32, 12, bkv=4, pool_pages=768)
    # controls
    run("B144 H16 page16 W24 (qwen3)", 144, 16, 16, 24)
    run("B64 H16 page16 W24", 64, 16, 16, 24)
    print("rc=0")


if __name__ == "__main__":
    main()
