"""Phase-level profile of the B=144 decode step and the detokenize step.

VERDICT r3 weak #2: the B=144 decode step costs 66 ms while touching ~5.5 GB
of HBM (<10% of v5e bandwidth) — this script attributes the step time to its
components by timing ablated variants of the SAME jitted step:

  full       — production step (backbone + cb0 sample + depth scan + rep)
  nodepth    — depth scan replaced by zero-pad (backbone + cb0 sample only)
  greedy     — all sampling argmax (isolates top-k cost, x16 calls/step)
  norep      — repetition penalty off (isolates the appearance-cache cost)
  bb_only    — nodepth + greedy + norep (backbone roofline proxy)
  unrollN    — depth scan unroll=N (software-pipelines depth weight fetches)

plus the detokenize bucket (B=80, len=10), the steady-state codec config.

Run on the real TPU:  python scripts/profile_decode.py
Writes artifacts/decode_profile_r4.json and prints a table.

Reference hot loop for comparison:
/root/reference/vox_serve/worker/cuda_graph_worker.py:946-1056.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vox_serve_tpu.models.base import BaseLM
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

#: VOX_PROF_MODEL=csm profiles the CSM-1B step (depth-33, Mimi) at its
#: serving batch; default is the Qwen3 flagship
PROF_MODEL = os.environ.get("VOX_PROF_MODEL", "qwen3")
BATCH = int(os.environ.get("VOX_PROF_BATCH",
                           {"csm": "64"}.get(PROF_MODEL, "144")))
DETOK_B = int(os.environ.get("VOX_PROF_DETOK_B",
                             {"csm": "64"}.get(PROF_MODEL, "80")))
STEPS = int(os.environ.get("VOX_PROF_STEPS", "20"))


def build_model():
    if PROF_MODEL == "csm":
        from vox_serve_tpu.models.csm import CSMLM

        return CSMLM(dtype=jnp.bfloat16)
    from vox_serve_tpu.models.qwen3_tts import Qwen3TTSLM

    return Qwen3TTSLM(dtype=jnp.bfloat16)


def build_worker():
    model = build_model()

    def _bf16(t):
        return jax.tree.map(
            lambda a: (a.astype(jnp.bfloat16)
                       if hasattr(a, "dtype") and a.dtype == jnp.float32
                       else a), t)

    model.codec_params = _bf16(model.codec_params)
    _orig = model.init_decoder_cache
    model.init_decoder_cache = lambda b: _bf16(_orig(b))
    wcfg = WorkerConfig(
        max_batch_size=BATCH, num_pages=3072, page_size=16,
        prefill_token_buckets=(128,), max_prefill_requests=5,
        warmup=False, pipeline_depth=2, use_pallas=True,
        decode_buckets_override=(BATCH,), multi_chunk_ks=(),
        detok_buckets_override=(16, DETOK_B),
    )
    return ModelWorker(model, wcfg)


def timed_decode(worker, label, seq_len=300, full_width=False):
    """Compile + time the packed decode fn under the CURRENT model/worker
    mutations. seq_len fills realistic block tables (attention reads KV);
    the block-table width is the serving lattice bucket covering seq_len
    (full_width=True forces max_pages_per_seq — the pre-r4 behavior)."""
    model = worker.model
    C = model.n_codebooks
    cfg = worker.config
    B = BATCH
    worker._lm_fns.clear()
    fn = worker._get_lm_fn("decode", (B,))
    pages_per_seq = seq_len // cfg.page_size + 1
    W = worker.max_pages_per_seq
    if not full_width:
        W = next((w for w in worker.table_width_buckets
                  if pages_per_seq + 1 <= w), W)
    packed_np = np.zeros((B, 2 * C + 6 + W), np.int32)
    for i in range(B):
        base = (i * pages_per_seq) % (cfg.num_pages - pages_per_seq - 1)
        packed_np[i, 2 * C + 1] = seq_len - 1          # positions
        packed_np[i, 2 * C + 2] = base + pages_per_seq - 1  # page_ids
        packed_np[i, 2 * C + 3] = (seq_len - 1) % cfg.page_size
        packed_np[i, 2 * C + 4] = seq_len              # seq_lens
        packed_np[i, 2 * C + 5] = i % cfg.max_batch_size
        packed_np[i, 2 * C + 6:2 * C + 6 + pages_per_seq] = np.arange(
            base, base + pages_per_seq)
    packed = jnp.asarray(packed_np)

    def call():
        out = fn(model.params, packed, worker.k_pages, worker.v_pages,
                 worker.rep_cache, worker.feedback, worker.last_tokens,
                 worker._base_key, jnp.int32(0))
        (_, worker.k_pages, worker.v_pages, worker.rep_cache,
         worker.feedback, worker.last_tokens) = out
        return out[0]

    t0 = time.monotonic()
    jax.block_until_ready(call())
    compile_s = time.monotonic() - t0
    jax.block_until_ready(call())
    t0 = time.monotonic()
    out = None
    for _ in range(STEPS):
        out = call()
    jax.block_until_ready(out)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>14}: {ms:8.2f} ms/step   (compile {compile_s:.1f}s)",
          flush=True)
    return ms


def timed_detok(worker, label, B, L):
    model = worker.model
    C = model.n_codebooks
    key = B if L == model.detokenize_interval else (B, L)
    worker._detok_fns.clear()
    fn = worker._get_detok_fn(key)
    toks = jnp.zeros((B, L, C), jnp.int32)
    slots = jnp.full((B,), worker.config.max_batch_size, jnp.int32)

    def call():
        audio, worker.codec_cache = fn(model.codec_params, toks,
                                       worker.codec_cache, slots)
        return audio

    t0 = time.monotonic()
    jax.block_until_ready(call())
    compile_s = time.monotonic() - t0
    jax.block_until_ready(call())
    t0 = time.monotonic()
    out = None
    for _ in range(STEPS):
        out = call()
    jax.block_until_ready(out)
    ms = (time.monotonic() - t0) / STEPS * 1e3
    print(f"{label:>14}: {ms:8.2f} ms/call   (compile {compile_s:.1f}s)",
          flush=True)
    return ms


def _fresh_rep(worker):
    """Donation-safe repetition cache (a stashed cache is deleted the first
    time a variant donates it)."""
    from vox_serve_tpu.sampling import init_repetition_cache

    model = worker.model
    sc = model.sampling_config
    cache = init_repetition_cache(
        worker.config.max_batch_size, sc.cache_window, model.n_codebooks,
        model.vocab_size)
    return jax.device_put(cache, worker.lm_device)


def main():
    worker = build_worker()
    model = worker.model
    results = {}

    results["full"] = timed_decode(worker, "full")
    results["full_oldwidth"] = timed_decode(worker, "full_oldwidth",
                                            full_width=True)

    # --- greedy: every sample() (cb0 + 15 depth heads) becomes argmax ----
    orig_scfg = model.sampling_config
    model.sampling_config = orig_scfg.replace(greedy=True)
    results["greedy"] = timed_decode(worker, "greedy")
    model.sampling_config = orig_scfg

    # --- norep: repetition penalty + appearance cache off ----------------
    model.sampling_config = orig_scfg.replace(repetition_penalty=None)
    worker.rep_cache = None
    results["norep"] = timed_decode(worker, "norep")
    worker.rep_cache = _fresh_rep(worker)
    model.sampling_config = orig_scfg

    # --- nodepth: depth scan replaced by zero-pad -------------------------
    orig_ps = model.post_sample
    model.post_sample = lambda p, h, ids, rng, gen_idx=None: \
        BaseLM.post_sample(model, p, h, ids, rng, gen_idx)
    results["nodepth"] = timed_decode(worker, "nodepth")

    # --- bb_only: backbone + argmax, no depth, no rep ---------------------
    model.sampling_config = orig_scfg.replace(greedy=True,
                                              repetition_penalty=None)
    worker.rep_cache = None
    results["bb_only"] = timed_decode(worker, "bb_only")

    # --- noattn: paged_attention_decode -> identity (isolates the ragged
    # kernel's share of the backbone) --------------------------------------
    import vox_serve_tpu.models.backbone as bb

    orig_attn = bb.paged_attention_decode
    bb.paged_attention_decode = \
        lambda q, kp, vp, layer, meta, scale=None, use_pallas=False: q
    results["bb_noattn"] = timed_decode(worker, "bb_noattn")

    # --- nowrite: KV scatter -> no-op (isolates the paged write) ---------
    orig_write = bb.write_kv_prefill
    bb.write_kv_prefill = lambda kp, vp, layer, k, v, meta: (kp, vp)
    results["bb_noattn_nowrite"] = timed_decode(worker, "bb_noattn_nowrite")
    bb.write_kv_prefill = orig_write
    bb.paged_attention_decode = orig_attn

    # --- seq16: near-empty KV (attention's seq-dependent share) -----------
    results["bb_seq16"] = timed_decode(worker, "bb_seq16", seq_len=16)

    # --- backbone layer-scan unroll ---------------------------------------
    for unroll in (2, 4):
        os.environ["VOX_BACKBONE_UNROLL"] = str(unroll)
        results[f"bb_unroll{unroll}"] = timed_decode(
            worker, f"bb_unroll{unroll}")
    os.environ.pop("VOX_BACKBONE_UNROLL", None)

    worker.rep_cache = _fresh_rep(worker)
    model.sampling_config = orig_scfg
    model.post_sample = orig_ps

    # --- depth unroll sweep ------------------------------------------------
    for unroll in (3, 5):
        os.environ["VOX_DEPTH_UNROLL"] = str(unroll)
        results[f"unroll{unroll}"] = timed_decode(worker, f"unroll{unroll}")
    os.environ.pop("VOX_DEPTH_UNROLL", None)

    # --- detokenize --------------------------------------------------------
    L = model.detokenize_interval
    results[f"detok_{DETOK_B}x{L}"] = timed_detok(
        worker, f"detok_{DETOK_B}x{L}", DETOK_B, L)
    results[f"detok_16x{L}"] = timed_detok(worker, f"detok_16x{L}", 16, L)
    results[f"detok_16x{L // 2}"] = timed_detok(
        worker, f"detok_16x{L // 2}", 16, L // 2)

    full, nodepth = results["full"], results["nodepth"]
    summary = {
        "batch": BATCH,
        "steps_timed": STEPS,
        "results_ms": {k: round(v, 2) for k, v in results.items()},
        "attribution_ms": {
            "depth_scan": round(full - nodepth, 2),
            "sampling_topk_all": round(full - results["greedy"], 2),
            "repetition": round(full - results["norep"], 2),
            "backbone_plus_overhead": round(results["bb_only"], 2),
            "attention_kernel": round(
                results["bb_only"] - results["bb_noattn"], 2),
            "kv_write": round(
                results["bb_noattn"] - results["bb_noattn_nowrite"], 2),
            "linear_embed_rest": round(results["bb_noattn_nowrite"], 2),
        },
    }
    summary["model"] = PROF_MODEL
    print(json.dumps(summary, indent=2))
    os.makedirs("artifacts", exist_ok=True)
    suffix = "" if PROF_MODEL == "qwen3" else f"_{PROF_MODEL}"
    with open(f"artifacts/decode_profile{suffix}_r4.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
