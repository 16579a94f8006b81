"""Measure CosyVoice2's LM-decode vs CFM-detokenize device-time split.

The r4 disaggregation model (artifacts/disagg_model_r4.md) asserted the
flow-codec families are the disagg case on an UNMEASURED CFM decoder cost
(VERDICT r4 next-step #4). This times, at the serving batch, one fused
k-step LM decode round and one detokenize window (conformer flow + 10-step
Euler CFM + HiFT — reference stack
/root/reference/vox_serve/tokenizer/cosyvoice_flow.py:2595-2980) and
reports the detok share of total per-frame device time. The disagg
break-even from disagg_model_r4.md is a >50% detok share.

Run on the real TPU:
    python scripts/exp_cosyvoice_share.py
Writes artifacts/cosyvoice_share_r5.json.
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

BATCH = int(os.environ.get("VOX_CV_BATCH", "32"))
K = int(os.environ.get("VOX_CV_K", "5"))
STEPS = 10
MODEL = os.environ.get("VOX_CV_MODEL", "cosyvoice2")


def main() -> None:
    from vox_serve_tpu.requests import Request
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    if MODEL == "chatterbox":
        from vox_serve_tpu.models.chatterbox import ChatterboxLM as LM
    else:
        from vox_serve_tpu.models.cosyvoice2 import CosyVoice2LM as LM

    model = LM(dtype=jnp.bfloat16)

    def _bf16(t):
        return jax.tree.map(
            lambda a: (a.astype(jnp.bfloat16)
                       if hasattr(a, "dtype") and a.dtype == jnp.float32
                       else a), t)

    model.codec_params = _bf16(model.codec_params)
    _orig = model.init_decoder_cache
    model.init_decoder_cache = lambda b: _bf16(_orig(b))

    interval = model.detokenize_interval
    overlap = model.detokenize_overlap
    # steady-state detok demand per LM step is BATCH/(interval-overlap)
    # requests; the worker pads to the detok bucket
    detok_b = 16
    wcfg = WorkerConfig(
        max_batch_size=BATCH, num_pages=2048, page_size=16,
        prefill_token_buckets=(128,), max_prefill_requests=4,
        warmup=False, pipeline_depth=2, use_pallas=True,
        decode_buckets_override=(BATCH,), fused_decode_steps=K,
        fused_decode_buckets=(BATCH,), multi_chunk_ks=(),
        detok_buckets_override=(detok_b,),
    )
    worker = ModelWorker(model, wcfg)

    reqs = [Request(request_id=f"cv{i}", prompt="a sentence to speak " * 3,
                    is_streaming=False) for i in range(BATCH)]
    for i in range(0, BATCH, wcfg.max_prefill_requests):
        worker.run_lm_prefill(reqs[i:i + wcfg.max_prefill_requests])
    assert worker.can_decode_multi(reqs, K)
    for _ in range(3):
        worker.run_lm_decode_multi(reqs, K)
    worker.sync()
    t0 = time.monotonic()
    for _ in range(STEPS):
        worker.run_lm_decode_multi(reqs, K)
    worker.sync()
    lm_round_ms = (time.monotonic() - t0) / STEPS * 1e3
    lm_ms_per_frame = lm_round_ms / (BATCH * K)

    # detokenize one window batch of detok_b requests (interval tokens each)
    win = reqs[:detok_b]
    for r in win:
        need = interval + 2 * overlap
        if len(r.lm_output_audio_tokens) < need:
            r.lm_output_audio_tokens = [
                np.full((1,), 7 + j, np.int32) for j in range(need)]
        r.next_audio_decode_idx = [0]
    worker.run_detokenize(win)
    worker.flush_detokenize()
    for r in win:
        while not r.output_audio.empty():
            r.output_audio.get()
    t0 = time.monotonic()
    for _ in range(STEPS):
        for r in win:
            r.next_audio_decode_idx = [0]
            r.extras.pop("detok_chunk_count", None)
        worker.run_detokenize(win)
        worker.flush_detokenize()
    detok_win_ms = (time.monotonic() - t0) / STEPS * 1e3
    # each window emits (interval - overlap) new frames per request
    detok_ms_per_frame = detok_win_ms / (detok_b * (interval - overlap))

    share = detok_ms_per_frame / (detok_ms_per_frame + lm_ms_per_frame)
    out = {
        "model": MODEL, "batch": BATCH, "k": K,
        "interval": interval, "overlap": overlap,
        "lm_round_ms": round(lm_round_ms, 2),
        "lm_ms_per_frame": round(lm_ms_per_frame, 4),
        "detok_window_ms_b16": round(detok_win_ms, 2),
        "detok_ms_per_frame": round(detok_ms_per_frame, 4),
        "detok_share": round(share, 3),
        "disagg_breakeven_share": 0.5,
        "disagg_case": bool(share > 0.5),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        f"{MODEL}_share_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
