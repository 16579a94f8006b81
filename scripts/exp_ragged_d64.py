"""Can the stock ragged_paged_attention kernel replace the legacy fold
kernel for head_dim-64 models (CSM, Chatterbox)?

artifacts/decode_profile_csm_r4.json: the legacy head-major fold kernel
costs 94.5 ms of CSM's 116 ms B=64 decode step, sequence-length
INDEPENDENT — (16 layers x 64 seqs x 8 kv-heads x ~24 pages) tiny 2 KB
page DMAs are latency-bound. The combined token-major layout fixed this
for head_dim-128 models (one page DMA carries all heads' K+V); our gate
(ops/kv_cache.py:combined_kv_supported) requires head_dim == 128, but the
stock kernel's validator has no such constraint.

Times, at CSM's decode shape (B=64, H=32, KH=8, D=64, page 16, seq 300):
  ragged_d64   — stock kernel, native (page, 16, 64) tiles
  ragged_d128  — stock kernel, head_dim zero-padded to 128 (2x KV bytes)
  fold_legacy  — the in-repo fold kernel on the head-major pair (current)
Each x16 layers estimates the per-step attention cost.

Run: python scripts/exp_ragged_d64.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, KH, D, PAGE = 64, 32, 8, 64, 16
SEQ = 300
WIDTH = 24           # serving block-table width bucket for seq 300
P = 3072             # pool pages
STEPS = 12


def mk_meta():
    pages_per_seq = SEQ // PAGE + 1
    tables = np.zeros((B, WIDTH), np.int32)
    for i in range(B):
        base = (i * pages_per_seq) % (P - pages_per_seq - 1)
        tables[i, :pages_per_seq] = np.arange(base, base + pages_per_seq)
    return (jnp.asarray(tables),
            jnp.full((B,), SEQ, jnp.int32),
            jnp.arange(B + 1, dtype=jnp.int32),
            jnp.array([B], jnp.int32))


def time_chain(label, fn, q, *args):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(q, *args))
    t0 = time.monotonic()
    y = q
    for _ in range(STEPS):
        y = jfn(y, *args)   # chain q through the output (same shape)
    jax.block_until_ready(y)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>12}: {ms:7.3f} ms/layer-call   x16 = {ms * 16:6.1f} ms",
          flush=True)
    return ms


def main():
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention,
    )

    key = jax.random.key(0)
    tables, seq_lens, cu_q, num_seqs = mk_meta()
    scale = 1.0 / (D ** 0.5)

    q64 = (jax.random.normal(key, (B, H, D)) * 0.1).astype(jnp.bfloat16)
    pool64 = (jax.random.normal(jax.random.key(1), (P, PAGE, 2 * KH, D))
              * 0.1).astype(jnp.bfloat16)

    def ragged(q, pool):
        return ragged_paged_attention(
            q, pool, seq_lens, tables, cu_q, num_seqs, sm_scale=scale,
            vmem_limit_bytes=64 * 1024 * 1024)

    try:
        t64 = time_chain("ragged_d64", ragged, q64, pool64)
    except Exception as e:  # pragma: no cover - probe
        print(f"ragged_d64 FAILED: {type(e).__name__}: {e}", flush=True)
        t64 = None

    # padded variant: q/pool zero-padded to D=128; output sliced back.
    # zero pad is exact: padded q/k lanes contribute 0 to scores, padded v
    # lanes produce zeros that the slice drops.
    pool128 = jnp.pad(pool64, ((0, 0), (0, 0), (0, 0), (0, 128 - D)))

    def ragged_pad(q, pool):
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 128 - D)))
        out = ragged_paged_attention(
            qp, pool, seq_lens, tables, cu_q, num_seqs,
            sm_scale=scale, vmem_limit_bytes=64 * 1024 * 1024)
        return out[..., :D]

    t128 = time_chain("ragged_d128", ragged_pad, q64, pool128)

    # current legacy fold kernel on the head-major pair layout
    from vox_serve_tpu.ops.attention import AttnMetadata
    from vox_serve_tpu.ops.pallas_attention import (
        pallas_paged_attention_decode,
    )

    kp = (jax.random.normal(jax.random.key(2), (1, KH, P, PAGE, D))
          * 0.1).astype(jnp.bfloat16)
    vp = (jax.random.normal(jax.random.key(3), (1, KH, P, PAGE, D))
          * 0.1).astype(jnp.bfloat16)
    zero = jnp.zeros((B,), jnp.int32)
    meta = AttnMetadata(is_prefill=False, kv_page_ids=zero,
                        kv_page_offsets=zero, block_tables=tables,
                        seq_lens=seq_lens)

    def fold(q, kp, vp):
        return pallas_paged_attention_decode(q, kp, vp, 0, meta, scale=scale)

    tf = time_chain("fold_legacy", fold, q64, kp, vp)

    # numeric cross-check: d64 (or d128) vs the gather oracle
    from vox_serve_tpu.ops.attention import _combined_decode_gather

    want = _combined_decode_gather(q64, pool64[None], 0, meta, scale)
    got = (jax.jit(ragged)(q64, pool64) if t64 is not None
           else jax.jit(ragged_pad)(q64, pool128))
    err = float(jnp.abs(got.astype(jnp.float32)
                        - want.astype(jnp.float32)).max())
    print(f"max abs err vs gather oracle: {err:.2e}", flush=True)
    print("rc=0")


if __name__ == "__main__":
    main()
