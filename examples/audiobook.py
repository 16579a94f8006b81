#!/usr/bin/env python
"""Audiobook batch client: split a text file into sentences, synthesize them
concurrently, concatenate to one WAV (capability parity with
examples/audiobook in the reference)."""

import argparse
import asyncio
import io
import re
import wave

import aiohttp


async def synth(session, url, text, idx, results):
    async with session.post(url + "/generate",
                            data={"text": text, "streaming": "false"},
                            timeout=aiohttp.ClientTimeout(total=900)) as r:
        body = await r.read()
        if r.status != 200:
            # an error body spliced into the PCM would play as garbage
            print(f"sentence {idx} failed ({r.status}): {body[:120]!r}")
            return
        results[idx] = body


async def run(args):
    text = open(args.textfile).read()
    sentences = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text)
                 if s.strip()]
    results = [None] * len(sentences)
    sem = asyncio.Semaphore(args.concurrency)

    async def bounded(i, s):
        async with sem:
            await synth(session, args.url, s, i, results)

    async with aiohttp.ClientSession() as session:
        await asyncio.gather(*[bounded(i, s) for i, s in enumerate(sentences)])

    # concatenate PCM payloads
    ok = [r for r in results if r]
    if not ok:
        raise SystemExit("no sentence synthesized successfully")
    pcm = b"".join(r[44:] for r in ok)
    sr = wave.open(io.BytesIO(ok[0]), "rb").getframerate()
    with wave.open(args.out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm)
    print(f"{len(sentences)} sentences -> {args.out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("textfile")
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--out", default="audiobook.wav")
    p.add_argument("--concurrency", type=int, default=8)
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
