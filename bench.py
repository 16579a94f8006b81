"""Driver benchmark: decode throughput on a flagship-shaped model.

Builds a Qwen3-TTS-1.7B-talker-dimensioned backbone (random bf16 weights —
checkpoint loading is exercised elsewhere; kernel/runtime performance is
weight-agnostic), runs the bucketed decode step (paged attention + fused
sampling) at batch 8 on the real TPU, and reports decode tokens/s.

vs_baseline normalizes against the BASELINE.md capacity target: >= 100
concurrent real-time streams/chip at the 12.5 Hz frame rate means the LM must
sustain >= 1250 backbone decode tokens/s; vs_baseline = value / 1250.

Prints exactly ONE JSON line.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.models.backbone import (
    BackboneConfig, backbone_forward, init_backbone_params,
)
from vox_serve_tpu.ops.attention import AttnMetadata
from vox_serve_tpu.ops.kv_cache import KVCacheConfig, alloc_kv_pages
from vox_serve_tpu.sampling import SamplingConfig, sample_and_update

BATCH = 8
CONTEXT = 128  # tokens already in KV per request
STEPS = 50
WARMUP = 5
TARGET_TOKENS_PER_S = 100 * 12.5  # 100 RTF>=1 streams at 12.5 Hz


def main():
    cfg = BackboneConfig(
        vocab_size=3072, hidden_size=2048, num_layers=28, num_heads=16,
        num_kv_heads=8, intermediate_size=6144, qk_norm=True,
        rope_theta=1_000_000.0, dtype=jnp.bfloat16,
    )
    page_size = 16
    kv_cfg = KVCacheConfig(
        num_layers=cfg.num_layers, num_pages=512, page_size=page_size,
        num_kv_heads=cfg.num_kv_heads, head_dim=cfg.resolved_head_dim,
    )
    key = jax.random.key(0)
    params = init_backbone_params(cfg, key)
    embed = (jax.random.normal(jax.random.fold_in(key, 1),
                               (cfg.vocab_size, cfg.hidden_size)) * 0.02
             ).astype(cfg.dtype)
    head = (jax.random.normal(jax.random.fold_in(key, 2),
                              (cfg.hidden_size, cfg.vocab_size)) * 0.02
            ).astype(cfg.dtype)
    k_pages, v_pages = alloc_kv_pages(kv_cfg)
    scfg = SamplingConfig(top_k=50, top_p=1.0, temperature=0.9)

    pages_per_req = (CONTEXT + STEPS + WARMUP) // page_size + 2
    block_tables = np.zeros((BATCH, pages_per_req), np.int32)
    next_page = 1
    for b in range(BATCH):
        block_tables[b] = np.arange(next_page, next_page + pages_per_req)
        next_page += pages_per_req
    block_tables_j = jnp.asarray(block_tables)

    @jax.jit
    def decode_step(params, embed, head, tokens, positions, meta,
                    k_pages, v_pages, rng):
        x = jnp.take(embed, tokens, axis=0)
        h, k_pages, v_pages = backbone_forward(
            params, cfg, x, positions, meta, k_pages, v_pages)
        logits = (h @ head)[:, None, :]
        ids, _ = sample_and_update(logits, scfg, rng, None)
        return ids[:, 0], k_pages, v_pages

    def meta_for(t):
        page_idx = t // page_size
        return AttnMetadata(
            False,
            jnp.asarray(block_tables[:, page_idx].copy()),
            jnp.full((BATCH,), t % page_size, jnp.int32),
            block_tables=block_tables_j,
            seq_lens=jnp.full((BATCH,), t + 1, jnp.int32),
        )

    tokens = jnp.zeros((BATCH,), jnp.int32)
    rng = jax.random.key(7)

    t = CONTEXT
    for i in range(WARMUP):
        meta = meta_for(t)
        tokens, k_pages, v_pages = decode_step(
            params, embed, head, tokens,
            jnp.full((BATCH,), t, jnp.int32), meta, k_pages, v_pages,
            jax.random.fold_in(rng, i))
        t += 1
    jax.block_until_ready(tokens)

    start = time.perf_counter()
    for i in range(STEPS):
        meta = meta_for(t)
        tokens, k_pages, v_pages = decode_step(
            params, embed, head, tokens,
            jnp.full((BATCH,), t, jnp.int32), meta, k_pages, v_pages,
            jax.random.fold_in(rng, 100 + i))
        t += 1
    jax.block_until_ready(tokens)
    elapsed = time.perf_counter() - start

    tokens_per_s = BATCH * STEPS / elapsed
    print(json.dumps({
        "metric": "decode_tokens_per_s_1p7b_bf16_b8",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / TARGET_TOKENS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
