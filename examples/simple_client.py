#!/usr/bin/env python
"""Minimal streaming client: POST text, play/save the WAV as it streams."""

import argparse
import sys
import time

import httpx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("text", nargs="?", default="Hello from the TPU serving "
                   "framework, streaming audio as it is generated.")
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--out", default="out.wav")
    p.add_argument("--speaker", default=None)
    args = p.parse_args()

    data = {"text": args.text}
    if args.speaker:
        data["speaker"] = args.speaker
    start = time.perf_counter()
    first = None
    with httpx.stream("POST", args.url + "/generate", data=data,
                      timeout=600) as r, open(args.out, "wb") as f:
        r.raise_for_status()
        n = 0
        for chunk in r.iter_bytes():
            n += len(chunk)
            # first bytes past the 44-byte streaming WAV header = audio
            if first is None and n > 44:
                first = time.perf_counter() - start
            f.write(chunk)
    ttfa = f"TTFA {first * 1000:.0f} ms" if first else "no audio"
    print(f"wrote {n} bytes to {args.out}; {ttfa}")


if __name__ == "__main__":
    main()
