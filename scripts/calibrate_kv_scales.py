"""Measure K/V absmax for int8 KV-quantization calibration.

Runs a model with a FULL-PRECISION combined KV pool (quant="none"),
prefills + decodes a few requests, then scans the written pages of the
pool: K lives at even combined-head indices, V at odd
(ops/kv_cache.py alloc_kv_pages). Prints the measured absmax and the
suggested --kv-k-amax / --kv-v-amax (measured * headroom).

Usage:
    python scripts/calibrate_kv_scales.py --model qwen3-tts --steps 48
"""

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen3-tts")
    ap.add_argument("--steps", type=int, default=48,
                    help="decode steps to run before measuring")
    ap.add_argument("--prompt", default="The quick brown fox jumps over "
                    "the lazy dog; calibration sweep for KV scales.")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--headroom", type=float, default=1.25,
                    help="multiplier on measured absmax (clip margin)")
    args = ap.parse_args()

    from vox_serve_tpu.models import load_model
    from vox_serve_tpu.requests import Request
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    model = load_model(args.model)
    wcfg = WorkerConfig(max_batch_size=args.batch, num_pages=512,
                        warmup=False)
    worker = ModelWorker(model, wcfg)
    if not worker.kv_config.combined:
        raise SystemExit("model uses the legacy KV layout; int8 KV (and "
                         "this calibration) require the combined pool")

    reqs = [Request(request_id=f"cal{i}", prompt=args.prompt)
            for i in range(args.batch)]
    worker.run_lm_prefill(reqs)
    live = list(reqs)
    for _ in range(args.steps):
        live = [r for r in live if not r.done_lm_generation]
        if not live:
            break
        worker.run_lm_decode(live)

    pool = np.asarray(worker.k_pages)  # (L, P, page, 2KH, D)
    used = sorted({p for r in reqs for p in r.kv_pages})
    pages = pool[:, used]  # written pages only (page 0 is scratch)
    k = pages[:, :, :, 0::2, :]
    v = pages[:, :, :, 1::2, :]
    k_amax = float(np.abs(k).max())
    v_amax = float(np.abs(v).max())
    # per-layer breakdown helps spot an outlier layer that dominates scale
    per_layer_k = np.abs(k).max(axis=(1, 2, 3, 4))
    per_layer_v = np.abs(v).max(axis=(1, 2, 3, 4))
    print(f"model={args.model} pages_scanned={len(used)} "
          f"steps={args.steps}")
    print("per-layer K absmax:", np.round(per_layer_k, 2).tolist())
    print("per-layer V absmax:", np.round(per_layer_v, 2).tolist())
    print(f"measured: k_amax={k_amax:.3f} v_amax={v_amax:.3f}")
    print(f"suggested flags: --kv-quant int8 "
          f"--kv-k-amax {k_amax * args.headroom:.2f} "
          f"--kv-v-amax {v_amax * args.headroom:.2f}")


if __name__ == "__main__":
    main()
