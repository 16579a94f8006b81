"""Per-stage profile of the Qwen3 codec detokenize step (B=80, len=10 —
the steady-state serving bucket, 109 ms/call in the r4 decode profile).

Times each pipeline stage as its own jitted function with representative
shapes/dtypes so the 109 ms can be attributed: RVQ+pre-conv, sliding-window
transformer, ConvNeXt upsample stages, and each decoder rate block.

Run on the real TPU:  python scripts/profile_detok.py
Writes artifacts/detok_profile_r4.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vox_serve_tpu.codecs import qwen3_codec as qc

B = int(os.environ.get("VOX_PROF_DETOK_B", "80"))
T = int(os.environ.get("VOX_PROF_DETOK_T", "10"))
STEPS = int(os.environ.get("VOX_PROF_STEPS", "20"))

cfg = qc.Qwen3CodecConfig()


def bf16(t):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)


def timeit(label, fn, *args):
    fn = jax.jit(fn)
    t0 = time.monotonic()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.monotonic() - t0
    jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>22}: {ms:8.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    params = bf16(qc.init_qwen3_codec(cfg, jax.random.key(0)))
    cache = bf16(qc.qwen3_codec_init_cache(cfg, B))
    codes = jnp.zeros((B, cfg.num_quantizers, T), jnp.int32)
    results = {}

    # full pipeline
    results["full"] = timeit(
        "full_pipeline",
        lambda p, c, ch: qc._pipeline(p, cfg, c, ch)[0], params, codes, cache)

    # stage 1: RVQ + pre-conv + transformer
    def front(p, c, ch):
        hidden = qc.qwen3_rvq_decode(p, cfg, c)
        hidden, _ = qc._causal_conv(p["pre_conv"], hidden, 2, ch["pre_conv"])
        hidden = hidden.transpose(0, 2, 1)
        hidden, _ = qc._transformer(p, cfg, hidden, ch)
        return hidden

    results["front_rvq_tr"] = timeit("front_rvq_transformer", front,
                                     params, codes, cache)

    # stage 2: ConvNeXt upsample stages (input: (B, latent, T))
    hid0 = jnp.zeros((B, cfg.latent_dim, T), jnp.bfloat16)

    def ups(p, h, ch):
        for i, (stage, factor) in enumerate(zip(p["upsample"],
                                                cfg.upsampling_ratios)):
            sc = ch["upsample"][i]
            h, _ = qc._causal_transconv(stage["trans"], h, factor, factor,
                                        sc["trans"])
            h, _ = qc._convnext_block(stage["convnext"], h,
                                      sc["convnext_dw"])
        return h

    results["upsample"] = timeit("convnext_upsample", ups, params, hid0,
                                 cache)

    # stage 3: decoder, one rate block at a time
    t_up = T
    for f in cfg.upsampling_ratios:
        t_up *= f
    ch_in = cfg.decoder_dim
    hid = jnp.zeros((B, cfg.latent_dim, t_up), jnp.bfloat16)

    def conv0(p, h, ch):
        return qc._causal_conv(p["decoder"]["conv0"], h, 6, ch["dec_conv0"])[0]

    results["dec_conv0"] = timeit("dec_conv0", conv0, params, hid, cache)

    t_cur = t_up
    x_ch = ch_in
    for i, rate in enumerate(cfg.upsample_rates):
        out_ch = ch_in // (2 ** (i + 1))
        xin = jnp.zeros((B, x_ch, t_cur), jnp.bfloat16)

        def block(p, x, ch, i=i, rate=rate):
            b = p["decoder"]["blocks"][i]
            bc = ch["dec_blocks"][i]
            x = qc._snake_beta(x, b["alpha"], b["beta"])
            x, _ = qc._causal_transconv(b["trans"], x, rate, 2 * rate,
                                        bc["trans"])
            for j, dil in enumerate((1, 3, 9)):
                x, _ = qc._residual_unit(b["res"][j], x, dil, bc["res"][j])
            return x

        results[f"dec_block{i}_r{rate}_c{out_ch}"] = timeit(
            f"dec_block{i} r={rate} c={out_ch}", block, params, xin, cache)
        t_cur *= rate
        x_ch = out_ch

    accounted = (results["front_rvq_tr"] + results["upsample"]
                 + results["dec_conv0"]
                 + sum(v for k, v in results.items()
                       if k.startswith("dec_block")))
    summary = {
        "batch": B, "frames": T, "steps_timed": STEPS,
        "results_ms": {k: round(v, 2) for k, v in results.items()},
        "stage_sum_ms": round(accounted, 2),
        "full_ms": round(results["full"], 2),
    }
    print(json.dumps(summary, indent=2))
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/detok_profile_r4.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
