#!/usr/bin/env python
"""Online serving benchmark: TTFA percentiles + streaming viability under
Poisson/Gamma arrivals (capability parity with reference benchmark/goodput.py).

Fires streaming /generate requests at a target rate (or rate sweep) and
measures per request:
  * TTFA: request start -> first non-header audio chunk
  * streaming viability: % of chunks i >= 2 where the cumulative audio
    duration of chunks 1..i-1 exceeds the latency from chunk 1 to chunk i
    (reference goodput.py:186-215)

Prompt sources (reference goodput.py:104-151): the
``efficient-speech/tts-serving-benchmark`` (hifi / libritts / lj-speech) and
``efficient-speech/sts-serving-benchmark`` (alpacaeval / commoneval /
wildvoice) HF datasets, loaded offline-first from the local HF cache — or the
built-in fixed prompt pool. ``--audio-file`` additionally uploads a reference
audio with every request (the STS / voice-clone input path).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import random
import time
from pathlib import Path

import aiohttp
import numpy as np

PROMPTS = [
    "The quick brown fox jumps over the lazy dog.",
    "In a quiet village nestled between rolling hills, life moved slowly.",
    "Scientists announced a breakthrough in energy storage technology today.",
    "Please confirm your reservation for two guests at seven o'clock.",
    "The river wound its way through the valley, silver in the morning light.",
]

#: dataset name -> (repo, data_dir, split preference, text column)
#: (reference goodput.py:104-151)
DATASETS = {
    "hifi": ("efficient-speech/tts-serving-benchmark", "hifi-tts_clean",
             "test", "text"),
    "libritts": ("efficient-speech/tts-serving-benchmark", "libritts_clean",
                 "test", "text_normalized"),
    "lj-speech": ("efficient-speech/tts-serving-benchmark",
                  "lj-speech_default", "train", "normalized_text"),
    "alpacaeval": ("efficient-speech/sts-serving-benchmark", "alpacaeval",
                   "test", "prompt"),
    "commoneval": ("efficient-speech/sts-serving-benchmark", "commoneval",
                   "test", "prompt"),
    "wildvoice": ("efficient-speech/sts-serving-benchmark", "wildvoice",
                  "test", "prompt"),
}


def load_prompts(data_source: str) -> list[str]:
    """Offline-first dataset prompt loading; falls back to the fixed pool
    (with a warning) when the dataset is not in the local HF cache and
    downloads are not allowed."""
    if data_source == "fixed":
        return list(PROMPTS)
    repo, data_dir, split, column = DATASETS[data_source]
    if not os.environ.get("VOX_ALLOW_DOWNLOAD"):
        os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
    try:
        from datasets import load_dataset

        ds = load_dataset(repo, data_dir=data_dir)
        if hasattr(ds, "keys") and split in ds:
            ds = ds[split]
        elif hasattr(ds, "keys"):
            ds = ds[next(iter(ds.keys()))]
        texts = [r[column] for r in ds]
        print(f"loaded dataset {data_source!r}: {len(texts)} prompts")
        return texts
    except Exception as e:
        print(f"WARNING: dataset {data_source!r} unavailable "
              f"({type(e).__name__}); using the fixed prompt pool "
              "(set VOX_ALLOW_DOWNLOAD=1 to fetch)")
        return list(PROMPTS)


async def one_request(session, base, text, args, results, save_idx=None,
                      seq=None):
    start = time.perf_counter()
    chunk_times, chunk_durs, save_buf = [], [], []
    try:
        form = aiohttp.FormData()
        form.add_field("text", text)
        form.add_field("streaming", "true")
        if args.audio_file:
            form.add_field("audio", Path(args.audio_file).read_bytes(),
                           filename=Path(args.audio_file).name,
                           content_type="audio/wav")
        async with session.post(base + "/generate", data=form,
                                timeout=aiohttp.ClientTimeout(total=600)) as r:
            if r.status != 200:
                results.append(
                    {"error": f"HTTP {r.status}: {await r.text()}"})
                return
            header_seen = 0
            async for chunk in r.content.iter_any():
                now = time.perf_counter()
                if save_idx is not None:
                    save_buf.append(chunk)
                if header_seen < 44:  # skip WAV header bytes
                    take = min(44 - header_seen, len(chunk))
                    header_seen += take
                    chunk = chunk[take:]
                    if not chunk:
                        continue
                chunk_times.append(now)
                chunk_durs.append(len(chunk) / 2 / args.sample_rate)
    except Exception as e:
        results.append({"error": str(e)})
        return
    if not chunk_times:
        results.append({"error": "no audio"})
        return
    if save_idx is not None and save_buf:
        # per-rate subdir: a rate sweep restarts save_idx at 0 per rate
        out = Path(args.output_dir) / f"rate_{args._current_rate}"
        out.mkdir(parents=True, exist_ok=True)
        (out / f"req_{save_idx:04d}.wav").write_bytes(b"".join(save_buf))
    ttfa = chunk_times[0] - start
    viable = []
    # O(n) prefix sums: the quadratic sum blocked the shared event loop
    # after each stream, distorting concurrent requests' chunk timestamps
    # at exactly the high rates being measured
    import itertools

    prefix = list(itertools.accumulate(chunk_durs))
    late = []  # (chunk idx, ms past its playback deadline)
    for i in range(1, len(chunk_times)):
        played = prefix[i - 1]
        latency = chunk_times[i] - chunk_times[0]
        viable.append(played > latency)
        if latency >= played:
            late.append((i, round((latency - played) * 1000, 1)))
    late.sort(key=lambda x: -x[1])
    results.append({
        "seq": seq,
        "ttfa": ttfa,
        "viability": float(np.mean(viable)) if viable else 1.0,
        "all_viable": bool(all(viable)) if viable else True,
        "chunks": len(chunk_times),
        "audio_s": sum(chunk_durs),
        "late": late[:3],
    })


async def run_one_rate(args, prompts, rate) -> dict:
    args._current_rate = rate
    base = f"http://{args.host}:{args.port}"
    results = []
    rng = random.Random(args.seed)
    async with aiohttp.ClientSession() as session:
        tasks = []
        start = time.perf_counter()
        i = 0
        while True:
            if args.duration:
                if time.perf_counter() - start >= args.duration:
                    break
            elif i >= args.num_requests:
                break
            text = prompts[rng.randrange(len(prompts))]
            tasks.append(asyncio.create_task(one_request(
                session, base, text, args, results,
                save_idx=i if args.save_audio else None, seq=i)))
            i += 1
            # Poisson (exponential) or Gamma inter-arrival
            if args.burstiness == 1.0:
                gap = rng.expovariate(rate)
            else:
                gap = rng.gammavariate(args.burstiness,
                                       1.0 / (args.burstiness * rate))
            await asyncio.sleep(gap)
        await asyncio.gather(*tasks)

    ok = [r for r in results if "ttfa" in r]
    errs = len(results) - len(ok)
    if not ok:
        return {"rate": rate, "error": "all requests failed",
                "failures": errs}
    ttfas = np.array([r["ttfa"] for r in ok]) * 1000
    return {
        "rate": rate,
        "num_requests": len(ok),
        "failures": errs,
        "ttfa_ms": {
            "mean": round(float(ttfas.mean()), 1),
            "p50": round(float(np.percentile(ttfas, 50)), 1),
            "p90": round(float(np.percentile(ttfas, 90)), 1),
            "p95": round(float(np.percentile(ttfas, 95)), 1),
            "p99": round(float(np.percentile(ttfas, 99)), 1),
            "min": round(float(ttfas.min()), 1),
            "max": round(float(ttfas.max()), 1),
        },
        "viability_per_chunk": round(
            float(np.mean([r["viability"] for r in ok])) * 100, 1),
        "viability_all_chunks": round(
            float(np.mean([r["all_viable"] for r in ok])) * 100, 1),
        "total_audio_s": round(sum(r["audio_s"] for r in ok), 1),
        # per-request detail in arrival order: which phase of the run
        # (regime transitions, saturation onset) produced late chunks
        "per_request": [
            {"seq": r.get("seq"), "ttfa_ms": round(r["ttfa"] * 1000, 1),
             "viab": round(r["viability"], 3), "late": r.get("late", [])}
            for r in sorted(ok, key=lambda r: (r.get("seq") or 0))],
    }


async def run(args):
    prompts = load_prompts(args.data_source)
    out = []
    for rate in args.request_rate:
        out.append(await run_one_rate(args, prompts, rate))
    print(json.dumps(out[0] if len(out) == 1 else out, indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num-requests", type=int, default=32)
    p.add_argument("--duration", type=float, default=None,
                   help="generate arrivals for this many seconds instead of "
                        "a fixed request count")
    p.add_argument("--request-rate", "--rate", type=float, nargs="+",
                   default=[2.0], help="mean requests/s (sweep over several)")
    p.add_argument("--burstiness", type=float, default=1.0,
                   help="gamma shape k (1.0 = Poisson)")
    p.add_argument("--data-source", default="fixed",
                   choices=["fixed"] + sorted(DATASETS),
                   help="prompt corpus (HF datasets, offline-first)")
    p.add_argument("--audio-file", default=None,
                   help="upload this audio with every request (STS / "
                        "voice-clone input path)")
    p.add_argument("--save-audio", action="store_true")
    p.add_argument("--output-dir", default="/tmp/goodput_audio")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-rate", type=int, default=24000)
    args = p.parse_args()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
