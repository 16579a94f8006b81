"""Where do CSM-1B's 114 ms/decode-step go? (artifacts/csm_bench_r4.json)

The step = backbone decode (1B, ~2 GB reads) + depth_step (31 sequential
codebook iterations of a 111M-param decoder: ~6.9 GB weight re-reads,
roofline ~12 ms) + sampling. Warmup probes showed B=1 already costs 98 ms,
so the cost is batch-independent — per-iteration overhead inside the
codebook scan, not FLOPs or KV.

This times, at the bench batch:
  depth_full    — model.depth_step as served (scan of 31 iterations)
  depth_nosamp  — same scan with sampling replaced by argmax
  depth_prefused— scan with w_qkv/w_gu concats hoisted OUT of the scan
                  body (done once, passed in) — tests whether XLA re-runs
                  the 106M-param concat every iteration
  depth_unroll  — python-unrolled 31 iterations (no lax.scan)
  mlp_only      — 31 chained (B,1024)@(1024,16384)+(B,8192)@(8192,1024)
                  matmul pairs x 4 layers: the pure weight-streaming floor

Chained timing (y = f(y)) defeats the tunnel's result cache.

Run: python scripts/exp_csm_depth.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vox_serve_tpu.models.csm import AUDIO_VOCAB, N_AUDIO_CB, CSMLM
from vox_serve_tpu.models.depth import depth_forward, init_depth_kv

STEPS = 12
B = int(os.environ.get("B", "64"))


def time_chain(label, fn, *args):
    """fn(carry, *rest) -> carry; chain carry serially."""
    jfn = jax.jit(fn)
    carry = jfn(*args)
    jax.block_until_ready(carry)  # compile
    carry = args[0]
    t0 = time.monotonic()
    for _ in range(STEPS):
        carry = jfn(carry, *args[1:])
    jax.block_until_ready(carry)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>16}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    model = CSMLM(dtype=jnp.bfloat16)
    params = model.params
    dcfg = model._depth_cfg
    d = params["depth"]
    H = model._cfg.hidden_size
    rng = jax.random.key(7)
    hidden0 = jax.random.normal(jax.random.key(1), (B, H), jnp.bfloat16)
    cb0 = jnp.zeros((B,), jnp.int32)

    # ---- depth_full: served path. carry = hidden (feed output token sum
    # back into hidden so each step computes fresh values). params passed
    # as an ARGUMENT — closing over them bakes 3 GB into the MLIR and the
    # remote compile rejects the upload (HTTP 413).
    def full(hidden, params):
        toks, _ = model.depth_step(params, hidden, cb0, rng)
        return hidden + jnp.sum(toks, axis=1, keepdims=True).astype(
            hidden.dtype) * 1e-6

    t_full = time_chain("depth_full", full, hidden0, params)

    # ---- depth_nosamp: argmax instead of sample() (same prepared layers
    # as the served path — isolates pure sampling cost)
    def nosamp(hidden, d):
        from vox_serve_tpu.models.backbone import linear
        from vox_serve_tpu.models.depth import prepare_depth_layers

        db = prepare_depth_layers(d["backbone"])
        c0e = jnp.take(d["embeds"], jnp.clip(cb0, 0, AUDIO_VOCAB - 1), axis=0)
        x0 = jnp.stack([hidden.astype(model.dtype), c0e], axis=1)
        x0p = linear(d["proj"], x0.reshape(B * 2, -1)).reshape(B, 2, -1)
        kc, vc = init_depth_kv(dcfg, B)
        h, kc, vc = depth_forward(db, dcfg, x0p, 0, kc, vc)

        def body(carry, i):
            h, kc, vc = carry
            head_w = jnp.take(d["heads"], i - 1, axis=0)
            logits = h.astype(jnp.float32) @ head_w.astype(jnp.float32)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ci = jnp.take(d["embeds"],
                          jnp.clip(tok, 0, AUDIO_VOCAB - 1) + i * AUDIO_VOCAB,
                          axis=0)
            x = linear(d["proj"], ci)[:, None, :]
            h, kc, vc = depth_forward(db, dcfg, x, i + 1, kc, vc)
            return (h, kc, vc), tok

        (_, _, _), toks = jax.lax.scan(
            body, (h, kc, vc), jnp.arange(1, N_AUDIO_CB, dtype=jnp.int32))
        return hidden + jnp.sum(toks).astype(hidden.dtype) * 1e-6

    time_chain("depth_nosamp", nosamp, hidden0, d)

    # ---- depth_inbody_concat: the PRE-refactor served path — raw params
    # straight into depth_forward inside the scan body, so the w_qkv/w_gu
    # concats trace into the loop (what prepare_depth_layers removes)
    def inbody(hidden, d):
        from vox_serve_tpu.models.backbone import linear

        c0e = jnp.take(d["embeds"], jnp.clip(cb0, 0, AUDIO_VOCAB - 1), axis=0)
        x0 = jnp.stack([hidden.astype(model.dtype), c0e], axis=1)
        x0p = linear(d["proj"], x0.reshape(B * 2, -1)).reshape(B, 2, -1)
        kc, vc = init_depth_kv(dcfg, B)
        h, kc, vc = depth_forward(d["backbone"], dcfg, x0p, 0, kc, vc)

        def body(carry, i):
            h, kc, vc = carry
            head_w = jnp.take(d["heads"], i - 1, axis=0)
            logits = h.astype(jnp.float32) @ head_w.astype(jnp.float32)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ci = jnp.take(d["embeds"],
                          jnp.clip(tok, 0, AUDIO_VOCAB - 1) + i * AUDIO_VOCAB,
                          axis=0)
            x = linear(d["proj"], ci)[:, None, :]
            h, kc, vc = depth_forward(d["backbone"], dcfg, x, i + 1, kc, vc)
            return (h, kc, vc), tok

        (_, _, _), toks = jax.lax.scan(
            body, (h, kc, vc), jnp.arange(1, N_AUDIO_CB, dtype=jnp.int32))
        return hidden + jnp.sum(toks).astype(hidden.dtype) * 1e-6

    time_chain("depth_inbody", inbody, hidden0, d)

    # ---- mlp_only: weight-streaming floor for the scan's matmul volume
    lw = d["backbone"]["layers"]
    w_gu = jnp.concatenate([lw["mlp"]["gate"]["w"], lw["mlp"]["up"]["w"]],
                           axis=2)  # (L, 1024, 16384)
    w_down = lw["mlp"]["down"]["w"]  # (L, 8192, 1024)
    w_qkv = jnp.concatenate([lw["attn"]["q"]["w"], lw["attn"]["k"]["w"],
                             lw["attn"]["v"]["w"]], axis=2)
    w_o = lw["attn"]["o"]["w"]
    L = dcfg.num_layers

    def mlp_only(h, w_qkv, w_gu, w_down, w_o):
        def body(h, _):
            for li in range(L):
                qkv = h @ w_qkv[li]
                h = h + qkv[:, :dcfg.hidden_size] * 1e-6
                gu = h @ w_gu[li]
                g, u = jnp.split(gu, 2, axis=-1)
                y = (jax.nn.silu(g) * u) @ w_down[li]
                h = h + y * 1e-6
                h = h + (h @ w_o[li]) * 1e-6
            return h, None
        h, _ = jax.lax.scan(body, h, None, length=N_AUDIO_CB - 1)
        return h

    time_chain("mlp_only", mlp_only,
               jax.random.normal(jax.random.key(2), (B, dcfg.hidden_size),
                                 jnp.bfloat16), w_qkv, w_gu, w_down, w_o)

    # ---- concat_31x: the isolated cost of re-running the w_qkv/w_gu
    # concats inside a 31-iteration scan (what the refactor removed)
    def concat_cost(h, lw):
        def body(h, _):
            wq = jnp.concatenate([lw["attn"]["q"]["w"], lw["attn"]["k"]["w"],
                                  lw["attn"]["v"]["w"]], axis=2)
            wg = jnp.concatenate([lw["mlp"]["gate"]["w"],
                                  lw["mlp"]["up"]["w"]], axis=2)
            h = h + (jnp.sum(wq[..., :1]) + jnp.sum(wg[..., :1])).astype(
                h.dtype) * 1e-9
            return h, None
        h, _ = jax.lax.scan(body, h, None, length=N_AUDIO_CB - 1)
        return h

    time_chain("concat_31x", concat_cost,
               jax.random.normal(jax.random.key(3), (B, dcfg.hidden_size),
                                 jnp.bfloat16), lw)

    print(f"(B={B}, steps={STEPS}; full={t_full:.1f} ms)")
    print("rc=0")


if __name__ == "__main__":
    main()
