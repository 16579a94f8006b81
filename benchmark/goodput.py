#!/usr/bin/env python
"""Online serving benchmark: TTFA percentiles + streaming viability under
Poisson/Gamma arrivals (capability parity with reference benchmark/goodput.py).

Fires streaming /generate requests at a target rate and measures per request:
  * TTFA: request start -> first non-header audio chunk
  * streaming viability: % of chunks i >= 2 where the cumulative audio
    duration of chunks 1..i-1 exceeds the latency from chunk 1 to chunk i
    (reference goodput.py:186-215)
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time

import aiohttp
import numpy as np

PROMPTS = [
    "The quick brown fox jumps over the lazy dog.",
    "In a quiet village nestled between rolling hills, life moved slowly.",
    "Scientists announced a breakthrough in energy storage technology today.",
    "Please confirm your reservation for two guests at seven o'clock.",
    "The river wound its way through the valley, silver in the morning light.",
]


async def one_request(session, base, text, sample_rate, results):
    start = time.perf_counter()
    chunk_times, chunk_durs = [], []
    try:
        async with session.post(base + "/generate", data={"text": text},
                                timeout=aiohttp.ClientTimeout(total=600)) as r:
            header_seen = 0
            async for chunk in r.content.iter_chunked(65536):
                now = time.perf_counter()
                if header_seen < 44:  # skip WAV header bytes
                    take = min(44 - header_seen, len(chunk))
                    header_seen += take
                    chunk = chunk[take:]
                    if not chunk:
                        continue
                chunk_times.append(now)
                chunk_durs.append(len(chunk) / 2 / sample_rate)
    except Exception as e:
        results.append({"error": str(e)})
        return
    if not chunk_times:
        results.append({"error": "no audio"})
        return
    ttfa = chunk_times[0] - start
    viable = []
    for i in range(1, len(chunk_times)):
        played = sum(chunk_durs[:i])
        latency = chunk_times[i] - chunk_times[0]
        viable.append(played > latency)
    results.append({
        "ttfa": ttfa,
        "viability": float(np.mean(viable)) if viable else 1.0,
        "all_viable": bool(all(viable)) if viable else True,
        "chunks": len(chunk_times),
        "audio_s": sum(chunk_durs),
    })


async def run(args):
    base = f"http://{args.host}:{args.port}"
    results = []
    rng = random.Random(0)
    async with aiohttp.ClientSession() as session:
        tasks = []
        for i in range(args.num_requests):
            text = PROMPTS[i % len(PROMPTS)]
            tasks.append(asyncio.create_task(one_request(
                session, base, text, args.sample_rate, results)))
            # Poisson (exponential) or Gamma inter-arrival
            if args.burstiness == 1.0:
                gap = rng.expovariate(args.request_rate)
            else:
                gap = rng.gammavariate(args.burstiness,
                                       1.0 / (args.burstiness * args.request_rate))
            await asyncio.sleep(gap)
        await asyncio.gather(*tasks)

    ok = [r for r in results if "ttfa" in r]
    errs = len(results) - len(ok)
    if not ok:
        print(json.dumps({"error": "all requests failed", "failures": errs}))
        return
    ttfas = np.array([r["ttfa"] for r in ok]) * 1000
    out = {
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
    }
    print(json.dumps(out, indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num-requests", type=int, default=32)
    p.add_argument("--request-rate", type=float, default=2.0,
                   help="mean requests/s")
    p.add_argument("--burstiness", type=float, default=1.0,
                   help="gamma shape k (1.0 = Poisson)")
    p.add_argument("--sample-rate", type=int, default=24000)
    args = p.parse_args()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
