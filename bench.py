"""Driver benchmark: full flagship decode step throughput on the real TPU.

Builds the actual Qwen3-TTS-1.7B model (random bf16 weights — runtime/kernel
performance is weight-agnostic) and measures the COMPLETE per-frame decode
step: dual-channel embedding -> 28-layer talker with paged KV ->
suppress-masked fused sampling -> 15-codebook MTP depth scan with feedback.
That is exactly the hot loop of serving (one audio frame per request per
step at 12.5 Hz).

Reports frames/s (= decode steps/s x batch). vs_baseline normalizes against
the BASELINE.md capacity target of >= 100 concurrent real-time streams per
chip at 12.5 Hz (1250 frames/s).

Prints exactly ONE JSON line.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.models.qwen3_tts import Qwen3TTSLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

BATCH = 352
STEPS = 40
WARMUP = 4
TARGET_FRAMES_PER_S = 100 * 12.5


def main():
    model = Qwen3TTSLM(dtype=jnp.bfloat16)
    wcfg = WorkerConfig(
        max_batch_size=BATCH, num_pages=2816, page_size=16,
        prefill_token_buckets=(128,), max_prefill_requests=BATCH,
        warmup=False, pipeline_depth=4, use_pallas=True,
    )
    worker = ModelWorker(model, wcfg)

    reqs = [Request(request_id=f"b{i}",
                    prompt="A realistic TTS sentence to speak.")
            for i in range(BATCH)]
    for r in reqs:
        worker.run_lm_prefill([r])
        r.done_lm_generation = False  # keep decoding regardless of sampling

    for _ in range(WARMUP):
        worker.run_lm_decode(reqs)
        for r in reqs:
            r.done_lm_generation = False

    start = time.perf_counter()
    for _ in range(STEPS):
        worker.run_lm_decode(reqs)
        for r in reqs:
            r.done_lm_generation = False
    worker.sync()
    elapsed = time.perf_counter() - start

    frames_per_s = BATCH * STEPS / elapsed
    print(json.dumps({
        "metric": "flagship_decode_frames_per_s_qwen3tts_1p7b_b352",
        "value": round(frames_per_s, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / TARGET_FRAMES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
