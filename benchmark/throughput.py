#!/usr/bin/env python
"""Offline throughput benchmark: req/s and RTF over a simultaneous burst
(capability parity with reference benchmark/throughput.py:38-51)."""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp

from goodput import PROMPTS  # same prompt pool


async def one(session, base, text, sample_rate, results):
    try:
        async with session.post(base + "/generate",
                                data={"text": text, "streaming": "false"},
                                timeout=aiohttp.ClientTimeout(total=900)) as r:
            body = await r.read()
            results.append(max(len(body) - 44, 0) / 2 / sample_rate)
    except Exception:
        results.append(0.0)


async def run(args):
    base = f"http://{args.host}:{args.port}"
    results: list[float] = []
    start = time.perf_counter()
    async with aiohttp.ClientSession() as session:
        await asyncio.gather(*[
            one(session, base, PROMPTS[i % len(PROMPTS)], args.sample_rate,
                results)
            for i in range(args.num_requests)
        ])
    wall = time.perf_counter() - start
    audio_s = sum(results)
    print(json.dumps({
        "num_requests": args.num_requests,
        "wall_s": round(wall, 2),
        "throughput_req_s": round(args.num_requests / wall, 3),
        "audio_s": round(audio_s, 1),
        "rtf": round(audio_s / wall, 3),
    }, indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num-requests", type=int, default=16)
    p.add_argument("--sample-rate", type=int, default=24000)
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
