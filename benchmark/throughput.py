#!/usr/bin/env python
"""Offline throughput benchmark: req/s and RTF over a simultaneous burst
(capability parity with reference benchmark/throughput.py:38-51), with
per-request latency/audio/RTF detail."""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp

from goodput import load_prompts


async def one(session, base, text, sample_rate, results):
    t0 = time.perf_counter()
    try:
        async with session.post(base + "/generate",
                                data={"text": text, "streaming": "false"},
                                timeout=aiohttp.ClientTimeout(total=900)) as r:
            body = await r.read()
            latency = time.perf_counter() - t0
            # an HTTP error body must not count as generated audio
            audio_s = (max(len(body) - 44, 0) / 2 / sample_rate
                       if r.status == 200 else 0.0)
            results.append({
                "latency_s": round(latency, 3),
                "audio_s": round(audio_s, 3),
                "rtf": round(audio_s / latency, 3) if latency else 0.0,
                "ok": r.status == 200,
            })
    except Exception as e:
        results.append({"latency_s": time.perf_counter() - t0,
                        "audio_s": 0.0, "rtf": 0.0, "ok": False,
                        "error": str(e)})


async def run(args):
    base = f"http://{args.host}:{args.port}"
    prompts = load_prompts(args.data_source)
    results: list[dict] = []
    start = time.perf_counter()
    async with aiohttp.ClientSession() as session:
        await asyncio.gather(*[
            one(session, base, prompts[i % len(prompts)], args.sample_rate,
                results)
            for i in range(args.num_requests)
        ])
    wall = time.perf_counter() - start
    audio_s = sum(r["audio_s"] for r in results)
    out = {
        "num_requests": args.num_requests,
        "failures": sum(1 for r in results if not r["ok"]),
        "wall_s": round(wall, 2),
        "throughput_req_s": round(args.num_requests / wall, 3),
        "audio_s": round(audio_s, 1),
        "rtf": round(audio_s / wall, 3),
    }
    if args.per_request:
        out["requests"] = results
    print(json.dumps(out, indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num-requests", type=int, default=16)
    from goodput import DATASETS

    p.add_argument("--data-source", default="fixed",
                   choices=["fixed"] + sorted(DATASETS))
    p.add_argument("--per-request", action="store_true",
                   help="include per-request latency/audio/RTF rows")
    p.add_argument("--sample-rate", type=int, default=24000)
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
