#!/usr/bin/env python
"""Sampling-pipeline micro-latency (capability parity with reference
benchmark/sampling-latency.py): per-call latency percentiles of each fused
sampling variant on the real device."""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vox_serve_tpu.sampling import (  # noqa: E402
    SamplingConfig, init_repetition_cache, sample_and_update,
)

VARIANTS = {
    "greedy": SamplingConfig(greedy=True),
    "top_k": SamplingConfig(top_k=50, temperature=0.9),
    "top_p": SamplingConfig(top_p=0.9, temperature=0.9),
    "top_k_top_p": SamplingConfig(top_k=50, top_p=0.9, temperature=0.9),
    "min_p": SamplingConfig(min_p=0.1, temperature=0.9),
    "top_k_top_p_rep": SamplingConfig(top_k=50, top_p=0.9, temperature=0.9,
                                      repetition_penalty=1.3,
                                      repetition_window=-1),
}


def bench_batch(B: int, V: int, iters: int) -> dict:
    logits = jax.random.normal(jax.random.key(0), (B, 1, V))
    out = {}
    for name, cfg in VARIANTS.items():
        cache = (init_repetition_cache(B, cfg.cache_window, 1, V)
                 if cfg.uses_repetition_penalty else None)

        @jax.jit
        def step(lg, rng, c):
            return sample_and_update(lg, cfg, rng, c)

        ids, cache2 = step(logits, jax.random.key(1), cache)
        jax.block_until_ready(ids)
        lat = []
        for i in range(iters):
            t0 = time.perf_counter()
            ids, _ = step(logits, jax.random.key(i), cache)
            jax.block_until_ready(ids)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.array(lat)
        out[name] = {
            "mean_ms": round(float(lat.mean()), 3),
            "p50_ms": round(float(np.percentile(lat, 50)), 3),
            "p99_ms": round(float(np.percentile(lat, 99)), 3),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", "--batch-size", type=int, nargs="+",
                   default=[8], help="batch-size sweep (reference "
                   "sampling-latency.py sweeps batch/config matrices)")
    p.add_argument("--vocab", type=int, default=3072)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    out = {f"batch_{B}": bench_batch(B, args.vocab, args.iters)
           for B in args.batch_sizes}
    print(json.dumps(out if len(out) > 1 else next(iter(out.values())),
                     indent=2))


if __name__ == "__main__":
    main()
