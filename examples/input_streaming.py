#!/usr/bin/env python
"""Incremental text input example: feed text word by word (as an LLM would
stream it) while audio streams back concurrently."""

import argparse
import threading
import time

import httpx

TEXT = ("Streaming text to speech lets a voice assistant start speaking "
        "before the language model has finished writing its reply, which "
        "cuts perceived latency dramatically.")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--out", default="streamed.wav")
    p.add_argument("--words-per-push", type=int, default=3)
    p.add_argument("--push-interval", type=float, default=0.15)
    args = p.parse_args()

    r = httpx.post(args.url + "/generate/stream/start", data={}, timeout=30)
    r.raise_for_status()  # surface 'warming' / wrong-scheduler errors
    rid = r.json()["request_id"]
    print("request:", rid)

    total = {"bytes": 0}

    def consume():
        with httpx.stream("GET", f"{args.url}/generate/stream/{rid}/audio",
                          timeout=600) as r, open(args.out, "wb") as f:
            r.raise_for_status()
            for chunk in r.iter_bytes():
                f.write(chunk)
                total["bytes"] += len(chunk)

    t = threading.Thread(target=consume)
    t.start()

    words = TEXT.split(" ")
    for i in range(0, len(words), args.words_per_push):
        piece = " ".join(words[i:i + args.words_per_push]) + " "
        httpx.post(f"{args.url}/generate/stream/{rid}/text",
                   data={"text": piece}, timeout=30)
        time.sleep(args.push_interval)
    httpx.post(f"{args.url}/generate/stream/{rid}/end", timeout=30)
    t.join()
    print(f"wrote {total['bytes']} bytes to {args.out}")


if __name__ == "__main__":
    main()
