"""TPU A/B of int8 weight-only quantization on a weight-bound decode step.

Orpheus-3B's fused B=64 k=5 round ran 231-266 ms in r4 against a ~43 ms
weight-streaming floor (5 x 7.07 GB / 819 GB/s) — the family is weight-
bound with 6x headroom (artifacts/orpheus_bench_r4.json). int8 weights
halve the stream; this times the SAME decode executable with bf16 vs int8
backbone weights. VERDICT r4 next-step #8.

Run on the real TPU:
    VOX_WQ_MODEL=orpheus python -u scripts/exp_weight_quant.py
Writes artifacts/weight_quant_r5.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.worker import ModelWorker, WorkerConfig

MODEL = os.environ.get("VOX_WQ_MODEL", "orpheus")
BATCH = int(os.environ.get("VOX_WQ_BATCH", "64"))
STEPS = int(os.environ.get("VOX_WQ_STEPS", "12"))
K = int(os.environ.get("VOX_WQ_K", "5"))


def build_model():
    if MODEL == "orpheus":
        from vox_serve_tpu.models.orpheus import OrpheusLM

        return OrpheusLM(dtype=jnp.bfloat16)
    from vox_serve_tpu.models.qwen3_tts import Qwen3TTSLM

    return Qwen3TTSLM(dtype=jnp.bfloat16)


def build_worker(weight_quant):
    model = build_model()
    wcfg = WorkerConfig(
        max_batch_size=BATCH, num_pages=2048, page_size=16,
        prefill_token_buckets=(128,), warmup=False, pipeline_depth=2,
        use_pallas=True, decode_buckets_override=(BATCH,),
        fused_decode_steps=K, fused_decode_buckets=(BATCH,),
        multi_chunk_ks=(), detok_buckets_override=(16,),
        weight_quant=weight_quant,
    )
    return ModelWorker(model, wcfg)


def timed_rounds(worker, label, warm_rounds=3):
    """Time fused k-step rounds through the production dispatch path
    (run_lm_decode_multi), final block via worker.sync()."""
    from vox_serve_tpu.requests import Request

    reqs = [Request(request_id=f"wq{i}", prompt="the quick brown fox " * 4,
                    is_streaming=False)
            for i in range(BATCH)]
    worker.run_lm_prefill(reqs)
    assert worker.can_decode_multi(reqs, K), "fused path must be eligible"
    for _ in range(warm_rounds):
        worker.run_lm_decode_multi(reqs, K)
    worker.sync()
    t0 = time.monotonic()
    for _ in range(STEPS):
        worker.run_lm_decode_multi(reqs, K)
    worker.sync()
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>22}: {ms:8.2f} ms/round (k={K}, B={BATCH})", flush=True)
    for r in reqs:
        worker.free_kv_cache(r)
    return ms


def main():
    results = {"model": MODEL, "batch": BATCH, "k": K,
               "device": str(jax.devices()[0]), "modes": {}}
    for wq in ("none", "int8"):
        worker = build_worker(wq)
        bb = worker.model.params["backbone"]
        gb = sum(a.nbytes for a in jax.tree.leaves(bb)) / 2**30
        print(f"--- weight_quant={wq}  backbone={gb:.2f} GiB", flush=True)
        ms = timed_rounds(worker, f"wq={wq}")
        results["modes"][wq] = {"backbone_gib": round(gb, 2),
                                "round_ms": round(ms, 2),
                                "frames_per_s": round(BATCH * K / ms * 1e3)}
        del worker
    results["speedup"] = round(
        results["modes"]["none"]["round_ms"]
        / results["modes"]["int8"]["round_ms"], 3)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "weight_quant_r5.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
