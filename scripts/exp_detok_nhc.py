"""A/B the channels-last (NHC) Qwen3 codec decoder vs the NCH path at the
serving detokenize shape (B=80, 10-frame window, bf16), on the real TPU.

artifacts/detok_profile_r4.json: detok B=80 is ~103 ms with ~75 ms in the
two narrow-channel conv blocks; artifacts/conv_forms_r4.md measured NHC
~1.15-1.2x on those blocks in isolation. This validates the integrated
_decoder_blocks_nhc path (codecs/qwen3_codec.py) end-to-end.

Run: python scripts/exp_detok_nhc.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "80"))
FRAMES = int(os.environ.get("FRAMES", "10"))
STEPS = 10


def main():
    from vox_serve_tpu.codecs.qwen3_codec import (
        Qwen3CodecConfig, init_qwen3_codec, qwen3_codec_decode_chunk,
        qwen3_codec_init_cache,
    )

    cfg = Qwen3CodecConfig()  # serving-scale defaults
    params = init_qwen3_codec(cfg, jax.random.key(0))
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, params)
    codes = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.codebook_size, size=(B, cfg.num_quantizers, FRAMES)), jnp.int32)

    results = {}
    for mode, env in (("nch", "0"), ("nhc", "1")):
        os.environ["VOX_CODEC_NHC"] = env

        @jax.jit
        def step(params, codes, cache):
            return qwen3_codec_decode_chunk(params, cfg, codes, cache)

        cache = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            qwen3_codec_init_cache(cfg, B))
        t0 = time.monotonic()
        wav, cache = step(params, codes, cache)
        jax.block_until_ready(wav)
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        for _ in range(STEPS):
            wav, cache = step(params, codes, cache)  # cache chains the calls
        jax.block_until_ready(wav)
        ms = (time.monotonic() - t0) / STEPS * 1e3
        results[mode] = ms
        print(f"{mode}: {ms:7.2f} ms/window (B={B}, {FRAMES} frames; "
              f"compile {compile_s:.0f}s)", flush=True)
    speedup = results["nch"] / results["nhc"]
    print(f"speedup nhc vs nch: {speedup:.3f}x", flush=True)
    import json

    out = {"batch": B, "frames": FRAMES,
           "nch_ms": round(results["nch"], 2),
           "nhc_ms": round(results["nhc"], 2),
           "speedup_nhc": round(speedup, 3),
           "device": str(jax.devices()[0])}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "detok_nhc_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print("rc=0")


if __name__ == "__main__":
    main()
