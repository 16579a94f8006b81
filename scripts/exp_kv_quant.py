"""TPU A/B of KV-pool quantization on the flagship decode step.

Times the SAME packed fused/single decode executable with the pool at
bf16 vs f8_e4m3 vs int8 across sequence lengths (attention DMA bytes
scale with seq; quantization halves them). VERDICT r4 next-step #2.

Run on the real TPU:
    python scripts/exp_kv_quant.py            # qwen3 B=144
Writes artifacts/kv_quant_r5.json.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import profile_decode as pd  # noqa: E402  (reuses worker/timing machinery)

from vox_serve_tpu.worker import ModelWorker, WorkerConfig  # noqa: E402


def build_worker(quant: str) -> ModelWorker:
    import jax.numpy as jnp

    model = pd.build_model()

    def _bf16(t):
        return jax.tree.map(
            lambda a: (a.astype(jnp.bfloat16)
                       if hasattr(a, "dtype") and a.dtype == jnp.float32
                       else a), t)

    model.codec_params = _bf16(model.codec_params)
    _orig = model.init_decoder_cache
    model.init_decoder_cache = lambda b: _bf16(_orig(b))
    wcfg = WorkerConfig(
        max_batch_size=pd.BATCH, num_pages=3072, page_size=16,
        prefill_token_buckets=(128,), max_prefill_requests=5,
        warmup=False, pipeline_depth=2, use_pallas=True,
        decode_buckets_override=(pd.BATCH,), multi_chunk_ks=(),
        detok_buckets_override=(16, pd.DETOK_B),
        kv_quant=quant,
    )
    return ModelWorker(model, wcfg)


def main() -> None:
    results = {"model": pd.PROF_MODEL, "batch": pd.BATCH,
               "device": str(jax.devices()[0]), "modes": {}}
    seqs = [int(s) for s in os.environ.get(
        "VOX_KVQ_SEQS", "300,600,1200").split(",")]
    for quant in ("none", "f8_e4m3", "int8"):
        worker = build_worker(quant)
        pool_gb = worker.k_pages.nbytes / 2**30
        print(f"--- quant={quant}  pool={pool_gb:.2f} GiB  "
              f"dtype={worker.k_pages.dtype}", flush=True)
        row = {"pool_gib": round(pool_gb, 3),
               "pool_dtype": str(worker.k_pages.dtype), "steps_ms": {}}
        for seq in seqs:
            ms = pd.timed_decode(worker, f"{quant}@seq{seq}", seq_len=seq)
            row["steps_ms"][str(seq)] = round(ms, 2)
        results["modes"][quant] = row
        del worker  # free the pool before the next alloc

    base = results["modes"]["none"]["steps_ms"]
    for q in ("f8_e4m3", "int8"):
        results["modes"][q]["speedup_vs_bf16"] = {
            s: round(float(base[s]) / v, 3)
            for s, v in results["modes"][q]["steps_ms"].items()}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "kv_quant_r5.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
