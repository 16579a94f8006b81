"""Driver benchmark: REAL serving-path metrics on the TPU (BASELINE.md).

Builds the actual Qwen3-TTS-1.7B flagship (random bf16 weights — runtime and
kernel performance are weight-agnostic) behind the real OnlineScheduler and
measures, through the full scheduler -> prefill -> decode -> depth-scan ->
detokenize -> PCM pipeline:

  * TTFA: request enqueue -> first AUDIO chunk emitted (cold stream, after
    executable warmup), p50 over several runs — BASELINE target <= 80 ms
  * concurrent RTF>=1 capacity: audio-seconds produced per wall-second with
    a full batch of live streams (decode + detokenize + watermark share the
    chip) — BASELINE target >= 100 streams/chip
  * decode-only frames/s at the serving batch as a kernel-health cross-check

Primary metric = sustained RTF>=1 streams/chip. Prints exactly ONE JSON line
(extra keys carry the TTFA and decode numbers).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

from vox_serve_tpu.utils import apply_platform_override

apply_platform_override()  # VOX_SERVE_PLATFORM=cpu for off-TPU smoke runs

import jax.numpy as jnp

from vox_serve_tpu.models.qwen3_tts import Qwen3TTSLM
from vox_serve_tpu.requests import Request
from vox_serve_tpu.sampling import SamplingConfig
from vox_serve_tpu.scheduler.online import OnlineScheduler
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

#: model family under test. The driver metric is the qwen3 flagship;
#: VOX_BENCH_MODEL=csm benches CSM-1B (depth-33 model + Mimi codec +
#: silentcipher watermark — the most-machinery family, VERDICT r3 #6);
#: VOX_BENCH_MODEL=orpheus benches Orpheus-3B (largest backbone, SNAC
#: codec, 7-token frame regroup); VOX_BENCH_MODEL=cosyvoice2 benches
#: CosyVoice2-0.5B (small LM + the heaviest decoder: conformer flow CFM +
#: HiFT — the disaggregation-case family); VOX_BENCH_MODEL=chatterbox
#: benches Chatterbox (1B t3 backbone, same flow+HiFT decoder stack, perth
#: watermark, D=64 heads); VOX_BENCH_MODEL=zonos benches Zonos-v0.1
#: (9-codebook delay pattern, 86 Hz DAC frames — the highest frame-rate
#: family); VOX_BENCH_MODEL=step benches Step-Audio-2 (Whisper-adaptor
#: encoder + DiT flow decoder). Each mode feeds its profiles.py entry.
BENCH_MODEL = os.environ.get("VOX_BENCH_MODEL", "qwen3")
_DEFAULT_BATCH = {"qwen3": "144", "csm": "64", "orpheus": "64",
                  "cosyvoice2": "32", "chatterbox": "32",
                  "zonos": "32", "step": "32"}.get(BENCH_MODEL, "144")
BATCH = int(os.environ.get("VOX_BENCH_BATCH", _DEFAULT_BATCH))
#: KV pool: orpheus's 3B backbone (6.3 GB bf16 params, 112 KB/token KV)
#: leaves less HBM for pages than the 1-2B families
_DEFAULT_PAGES = {"orpheus": "2048"}.get(BENCH_MODEL, "3072")
#: full-batch fused decode (k steps per dispatch round) is the measured
#: production optimum (artifacts/bench_progression_r3.md: TTFA p50 109.6 ms
#: vs 135.6 ms single-step, streams 119.8 vs 122.8 — both above the 100
#: target, and only fused-full meets the <=120 ms TTFA goal) and matches
#: the qwen3 serving profile (vox_serve_tpu/profiles.py). Opt out with
#: VOX_BENCH_FUSED_FULL=0 for the single-step-decode A/B variant.
FUSED_FULL = os.environ.get("VOX_BENCH_FUSED_FULL", "1") != "0"
PROMPT = "A realistic sentence for the server to speak aloud."
CAPACITY_SECONDS = float(os.environ.get("VOX_BENCH_CAP_SECONDS", "8"))
#: capacity windows per run: the metric is the MEDIAN over N windows with
#: spread, not a single window (r3 showed 96.6 -> 122.8 stream swings on
#: identical code from tunnel/tenancy variance; VERDICT r3 weak #1/#7)
CAPACITY_WINDOWS = int(os.environ.get("VOX_BENCH_CAP_WINDOWS", "5"))
TTFA_RUNS = 5


#: capacity-stream token budget. Must fit the KV pool across the whole
#: batch (pages*page_size*0.95/batch ~ 324 at the 3072x16 default): with
#: fused k-step decode, streams that outlive the window would exhaust the
#: pool mid-window and sit deferred, silently capping the measured
#: capacity at the surviving fraction (r3: 68/144 streams producing).
#: Completed streams are replaced immediately (top_up churn), which is
#: also the realistic serving pattern. Orpheus: 7 tokens per 85 ms SNAC
#: frame means 300 tokens is only ~3.7 s of audio — churn/admission
#: overhead would dominate each stream's life; 450 tokens (~5.5 s) keeps
#: per-stream KV at 2048x16*0.95/64 ~ 486 tokens incl. prompt.
#: Zonos: 86 Hz DAC frames mean 300 tokens is ~3.5 s of audio; 600 (~7 s)
#: keeps admission churn from dominating each stream's life.
_DEFAULT_CAP_TOKENS = {"orpheus": "450",
                       "zonos": "600"}.get(BENCH_MODEL, "300")
CAP_TOKENS = int(os.environ.get("VOX_BENCH_CAP_TOKENS", _DEFAULT_CAP_TOKENS))


def _mkreq(i, max_tokens=1200):
    return Request(request_id=f"b{i}", prompt=PROMPT, is_streaming=True,
                   is_pressing=True,
                   sampling_config=SamplingConfig(max_tokens=max_tokens))


def _drain_audio_bytes(sched, only_rid=None):
    """Total AUDIO bytes drained; with only_rid, count just that request
    (a prior stream's pipelined detok can resolve during the next stream —
    counting its bytes fabricated ~100 ms-early TTFAs in round 2)."""
    n = 0
    out = []
    for msg in sched._inproc_results:
        rid, typ, body = msg.split(b"|", 2)
        if typ == b"AUDIO" and (only_rid is None or rid == only_rid):
            n += len(body)
            out.append(rid)
    sched._inproc_results.clear()
    return n, out


def main():
    global BATCH, CAPACITY_SECONDS
    if os.environ.get("VOX_BENCH_LOG_COMPILES"):
        import jax

        jax.config.update("jax_log_compiles", True)
        jax.config.update("jax_explain_cache_misses", True)
    smoke = bool(os.environ.get("VOX_BENCH_SMOKE"))
    if smoke:  # CPU logic check: tiny model, short phases
        from vox_serve_tpu.models.dummy import DummyLM

        BATCH = int(os.environ.get("VOX_BENCH_BATCH", "4"))
        CAPACITY_SECONDS = 2.0
        model = DummyLM(max_tokens=64)
    elif BENCH_MODEL == "csm":
        from vox_serve_tpu.models.csm import CSMLM

        model = CSMLM(dtype=jnp.bfloat16)
    elif BENCH_MODEL == "orpheus":
        from vox_serve_tpu.models.orpheus import OrpheusLM

        model = OrpheusLM(dtype=jnp.bfloat16)
    elif BENCH_MODEL == "cosyvoice2":
        from vox_serve_tpu.models.cosyvoice2 import CosyVoice2LM

        model = CosyVoice2LM(dtype=jnp.bfloat16)
    elif BENCH_MODEL == "chatterbox":
        from vox_serve_tpu.models.chatterbox import ChatterboxLM

        model = ChatterboxLM(dtype=jnp.bfloat16)
    elif BENCH_MODEL == "zonos":
        from vox_serve_tpu.models.zonos import ZonosLM

        model = ZonosLM(dtype=jnp.bfloat16)
    elif BENCH_MODEL == "step":
        from vox_serve_tpu.models.step_audio_2 import StepAudio2LM

        model = StepAudio2LM(dtype=jnp.bfloat16)
    else:
        interval = int(os.environ.get("VOX_BENCH_DETOK_INTERVAL", "10"))
        model = Qwen3TTSLM(dtype=jnp.bfloat16,
                           detokenize_interval=interval)
    if not smoke:
        if os.environ.get("VOX_BENCH_CODEC_BF16", "1") != "0":
            # the reference serves its codec at the model dtype (bf16,
            # model/qwen3_tts.py:1061-1064); halves codec HBM traffic.
            # Cast BEFORE worker construction so warmup compiles the bf16
            # executables (cache dtype is part of the jit signature).
            import jax

            def _bf16(t):
                return jax.tree.map(
                    lambda a: (a.astype(jnp.bfloat16)
                               if hasattr(a, "dtype")
                               and a.dtype == jnp.float32 else a), t)

            model.codec_params = _bf16(model.codec_params)
            _orig_idc = model.init_decoder_cache
            model.init_decoder_cache = lambda b: _bf16(_orig_idc(b))
    # 3072 pages = 5.25G KV (48k pooled tokens): bench streams hold ~16
    # pages each, and 4096 left only ~4G HBM headroom for the batch-96
    # detokenize temps (runtime ResourceExhausted)
    wcfg = WorkerConfig(
        max_batch_size=BATCH,
        num_pages=int(os.environ.get("VOX_BENCH_PAGES", _DEFAULT_PAGES)),
        page_size=int(os.environ.get("VOX_BENCH_PAGE_SIZE", "16")),
        # churn: capacity-stream completions arrive ~BATCH*k/CAP_TOKENS
        # per step; admissions must keep up or the batch drains. The dev
        # tokenizer yields ~50-token prompts, so a 128-token bucket packs
        # only 2 admissions per prefill dispatch; the 256 bucket packs 4+
        # (halves per-admission dispatch overhead inside the window). 128
        # stays as the small bucket so a single cold stream's chain prefill
        # isn't padded to 256 (TTFA).
        prefill_token_buckets=tuple(int(x) for x in os.environ.get(
            "VOX_BENCH_PREFILL_BUCKETS", "64,128,256").split(",")),
        max_prefill_requests=int(
            os.environ.get("VOX_BENCH_PREFILL_REQS", "5")),
        # warmup compiles the full (small) lattice up front — first-use
        # compiles previously landed INSIDE the capacity window (61s of
        # detok "time" was two bucket-16 codec compiles)
        warmup=not smoke, pipeline_depth=2, use_pallas=not smoke,
        kv_reserve_fraction=0.05,
        # keep the compile count down (remote TPU compiles are minutes each):
        # two decode buckets, no catch-up lengths. Detok gets its OWN small
        # lattice — a step's detok batch is ~BATCH/interval requests, and
        # padding it to the decode bucket made the codec do ~10x wasted work
        # (12.7 streams measured with detok at bucket 96).
        decode_buckets_override=(1, BATCH), multi_chunk_ks=(),
        # floor 16: the codec compiles pathologically at batch 1 / len 10
        # (4.4 s/step measured vs 76 ms at batch 16 — XLA shape quirk);
        # padding singleton detok batches to 16 costs ~nothing
        detok_buckets_override=(
            16, min(BATCH, int(os.environ.get(
                "VOX_BENCH_DETOK_CAP",
                # full-batch fused decode multiplies steady-state window
                # demand by k: ceil(144*5/10) = 72 -> 80-wide ceiling
                "80" if FUSED_FULL else "64")))),
        # two in-flight detok batches: batch N's audio readback must not
        # block behind the (wide) fused decode executable before N+1 can
        # even be dispatched
        detok_pipeline_depth=2,
        # TTFA: first audio after this many frames through the mini
        # executable instead of a full 10-frame window (3 frames = 240 ms
        # of audio, still >> chunk cadence; cuts ~2 frames x ~9 ms off the
        # cold chain executable)
        first_chunk_frames=int(os.environ.get("VOX_BENCH_FIRST_CHUNK", "3")),
        # fused cold-stream decode: the 5 frames of the first chunk run as
        # ONE scanned executable instead of 5 dispatch rounds.
        # VOX_BENCH_FUSED_FULL=1 additionally fuses the FULL decode batch
        # (k steps per dispatch round at B=BATCH): through a tunneled
        # backend each dispatch round absorbs the previous round's device
        # time (~120 ms measured), so fusing k steps amortizes that fixed
        # cost over k frames per stream.
        fused_decode_steps=int(os.environ.get("VOX_BENCH_FUSED_K", "5")),
        fused_decode_buckets=((1, BATCH) if FUSED_FULL else (1,)),
        # per-bucket granularity schedule (comma list, one k per bucket
        # above) — mirror of the serving profile's fused_k_schedule; empty
        # -> every bucket at VOX_BENCH_FUSED_K
        fused_k_schedule=(tuple(
            int(x) for x in os.environ.get(
                "VOX_BENCH_FUSED_K_SCHEDULE", "").split(",") if x) or None),
        # regime boundary (cold chains + admission ramp), mirroring the
        # qwen3 serving profile (profiles.py)
        fused_min_batch=(int(os.environ.get(
            "VOX_BENCH_FUSED_MIN", "65" if BENCH_MODEL == "qwen3" else "0"))
            or None),
        # int8 KV halves pool HBM (5.25->2.62G at 3072 pages) and is
        # measured FASTER at long context (artifacts/kv_quant_r5.json:
        # 66.2->58.9 ms/step at seq 1200, B=144) — capacity-bench lever
        # for batch > 144
        kv_quant=os.environ.get("VOX_BENCH_KV_QUANT", "none"),
        # int8 weight-only quant: halves the weight-streaming floor for
        # the weight-bound families (orpheus 3B)
        weight_quant=os.environ.get("VOX_BENCH_WEIGHT_QUANT", "none"),
    )
    worker = ModelWorker(model, wcfg)
    sched = OnlineScheduler(worker, max_batch_size=BATCH, connect=False)

    debug = bool(os.environ.get("VOX_BENCH_DEBUG"))
    phase_t: dict = {}
    if debug:  # per-phase wall-time accounting over the capacity loop
        def timed(name, fn):
            def wrapper(*a, **k):
                t = time.perf_counter()
                out = fn(*a, **k)
                dt = time.perf_counter() - t
                tot, n = phase_t.get(name, (0.0, 0))
                phase_t[name] = (tot + dt, n + 1)
                return out
            return wrapper

        for name in ("run_lm_decode", "run_lm_decode_multi", "run_lm_prefill",
                     "run_detokenize", "flush_detokenize",
                     "prepare_decode_batch"):
            if hasattr(worker, name):
                setattr(worker, name, timed(name, getattr(worker, name)))

    def run_stream(req, deadline_s=120.0, stop_after_first_audio=False):
        # flush any pipelined audio left over from a previous stream so it
        # cannot masquerade as this stream's first chunk
        worker.sync()
        if hasattr(worker, "flush_detokenize"):
            worker.flush_detokenize()
        _drain_audio_bytes(sched)
        rid = req.request_id.encode()
        t0 = time.perf_counter()
        first = None
        sched.enqueue_request(req)
        while time.perf_counter() - t0 < deadline_s:
            sched._step()
            nbytes, _ = _drain_audio_bytes(sched, only_rid=rid)
            if nbytes and first is None:
                first = time.perf_counter() - t0
                if stop_after_first_audio:
                    break
            if req.done_all:
                break
        req.done_all = True
        req.done_lm_generation = True
        sched.active_requests = [r for r in sched.active_requests
                                 if r is not req]
        worker.free_kv_cache(req)
        return first

    # ---- warmup: compile the single-stream path (prefill, decode b1, mini
    # detok ramp, regular detok) and the full-batch path -------------------
    run_stream(_mkreq("warm0", max_tokens=64))
    warm = [_mkreq(f"warm{i}", max_tokens=40) for i in range(1, BATCH + 1)]
    for r in warm:
        sched.enqueue_request(r)
    t0 = time.perf_counter()
    while any(not r.done_all for r in warm) and time.perf_counter() - t0 < 600:
        sched._step()
        _drain_audio_bytes(sched)
    for r in warm:
        sched.active_requests = [q for q in sched.active_requests if q is not r]
        worker.free_kv_cache(r)
    worker.sync()

    # ---- tunnel RPC floor: dispatch + readback of a trivial executable.
    # TTFA through the tunneled backend pays 2-3 of these per cold stream;
    # reporting the floor separates the hardware-level latency from the
    # harness transport (artifacts/bench_progression_r4.md).
    import jax

    _tiny = jax.jit(lambda x: x + 1)
    _x = jnp.zeros((8,), jnp.int32)
    jax.block_until_ready(_tiny(_x))
    rpc_samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(_tiny(_x))
        rpc_samples.append((time.perf_counter() - t0) * 1000.0)
    rpc_samples.sort()
    rpc_floor_ms = rpc_samples[len(rpc_samples) // 2]

    # ---- TTFA (cold stream on a warm server) ------------------------------
    phase_t.clear()
    ttfas = []
    for i in range(TTFA_RUNS):
        t = run_stream(_mkreq(f"ttfa{i}", max_tokens=64),
                       stop_after_first_audio=True)
        if t is not None:
            ttfas.append(t * 1000.0)
    worker.sync()
    if debug:
        print("ttfa raw:", [round(t, 1) for t in ttfas])
        print("ttfa-phase times:", {k: (round(v[0], 2), v[1])
                                    for k, v in phase_t.items()})
    ttfas.sort()
    ttfa_p50 = ttfas[len(ttfas) // 2] if ttfas else float("nan")
    ttfa_worst = ttfas[-1] if ttfas else float("nan")

    if os.environ.get("VOX_BENCH_PHASES") == "ttfa":
        print(json.dumps({"metric": "ttfa_p50_ms", "value": round(ttfa_p50, 1),
                          "unit": "ms", "vs_baseline": round(80.0 / ttfa_p50, 3)
                          if ttfa_p50 else None,
                          "ttfa_worst_ms": round(ttfa_worst, 1),
                          "rpc_floor_ms": round(rpc_floor_ms, 1)}))
        return

    # ---- concurrent capacity: audio-seconds produced per wall-second with
    # a full batch of live streams and realistic churn (finished streams are
    # replaced immediately) --------------------------------------------------
    cap_counter = [0]
    enqueue_t: dict = {}   # rid bytes -> enqueue perf_counter
    churn_ttfa: list = []  # churned-admission TTFA samples (ms)

    def top_up():
        alive = sum(1 for r in sched.active_requests if not r.done_all)
        for _ in range(BATCH - alive):
            req = _mkreq(f"cap{cap_counter[0]}", max_tokens=CAP_TOKENS)
            enqueue_t[req.request_id.encode()] = time.perf_counter()
            sched.enqueue_request(req)
            cap_counter[0] += 1

    def note_first_audio(rids):
        now = time.perf_counter()
        for rid in rids:
            t0 = enqueue_t.pop(rid, None)
            if t0 is not None:
                churn_ttfa.append((now - t0) * 1000.0)

    phase_t.clear()
    top_up()
    t0 = time.perf_counter()
    # fill the WHOLE batch before timing: the metric is sustained concurrent
    # streams, so the measured window should be steady-state decode+detok,
    # not admission churn (prefill+pipeline-resolve cost ~60 ms/admission).
    # Streams outlive the window (max_tokens 1200 ~ 95 s), so no completions
    # refill either.
    stall = 0
    while time.perf_counter() - t0 < 300:
        sched._step()
        top_up()
        n_in = sum(1 for r in sched.active_requests
                   if r.done_lm_prefill and not r.done_all)
        if n_in >= BATCH:
            break
        stall = stall + 1 if n_in >= BATCH * 3 // 4 else 0
        if stall > 200:  # KV admission ceiling reached below BATCH
            break
    if debug:
        print("fill done in", round(time.perf_counter() - t0, 1), "s;",
              sum(1 for r in sched.active_requests
                  if r.done_lm_prefill and not r.done_all),
              "streams in flight")
    phase_t.clear()  # capacity phases only (fill admissions excluded)
    worker.phase_stats.clear()
    _drain_audio_bytes(sched)
    churn_ttfa.clear()  # fill-phase admissions are warm-fill, not churn

    # N back-to-back measured windows over the same churned steady state;
    # the reported capacity is the MEDIAN with (max-min)/median spread
    window_streams = []
    for w in range(CAPACITY_WINDOWS):
        bytes_total = 0
        iters = 0
        t0 = time.perf_counter()
        # min-step floor: a stray first-use compile must not eat the window
        while time.perf_counter() - t0 < CAPACITY_SECONDS or iters < 60:
            sched._step()
            top_up()
            n, rids = _drain_audio_bytes(sched)
            note_first_audio(rids)
            bytes_total += n
            iters += 1
        worker.sync()
        n, rids = _drain_audio_bytes(sched)
        note_first_audio(rids)
        bytes_total += n
        wall = time.perf_counter() - t0
        audio_s = bytes_total / (2.0 * model.sample_rate)
        window_streams.append(audio_s / wall)
        if debug:
            print(f"window {w}: {audio_s / wall:.1f} streams "
                  f"({iters} iters, {wall:.2f}s)")
    if debug:
        print("phase times:", {k: (round(v[0], 2), v[1])
                               for k, v in phase_t.items()})
        print("worker segments:", {
            k: (round(v[0], 2), v[1])
            for k, v in sorted(worker.phase_stats.items())})
    window_streams.sort()
    streams_rtf1 = window_streams[len(window_streams) // 2]
    spread_pct = (100.0 * (window_streams[-1] - window_streams[0])
                  / max(streams_rtf1, 1e-9))
    churn_ttfa.sort()
    churn_p50 = churn_ttfa[len(churn_ttfa) // 2] if churn_ttfa else None
    churn_p95 = (churn_ttfa[int(len(churn_ttfa) * 0.95)]
                 if churn_ttfa else None)
    for r in sched.active_requests:
        r.done_all = True
        r.done_lm_generation = True
        worker.free_kv_cache(r)
    sched.active_requests = []

    # ---- decode-only frames/s cross-check ---------------------------------
    reqs = [_mkreq(f"d{i}") for i in range(BATCH)]
    for r in reqs:
        worker.run_lm_prefill([r])
        r.done_lm_generation = False
    for _ in range(4):
        worker.run_lm_decode(reqs)
        for r in reqs:
            r.done_lm_generation = False
    t0 = time.perf_counter()
    steps = 30
    for _ in range(steps):
        worker.run_lm_decode(reqs)
        for r in reqs:
            r.done_lm_generation = False
    worker.sync()
    decode_fps = BATCH * steps / (time.perf_counter() - t0)

    metric_name = {
        "qwen3": "concurrent_rtf1_streams_qwen3tts_1p7b",
        "csm": "concurrent_rtf1_streams_csm_1b",
    }.get(BENCH_MODEL, f"concurrent_rtf1_streams_{BENCH_MODEL}")
    print(json.dumps({
        "metric": metric_name,
        "value": round(streams_rtf1, 1),
        "unit": "streams",
        "vs_baseline": round(streams_rtf1 / 100.0, 3),
        "runs": len(window_streams),
        "windows_streams": [round(s, 1) for s in window_streams],
        "spread_pct": round(spread_pct, 1),
        "ttfa_p50_ms": round(ttfa_p50, 1),
        "ttfa_worst_ms": round(ttfa_worst, 1),
        "ttfa_runs": len(ttfas),
        "ttfa_churned_p50_ms": (round(churn_p50, 1)
                                if churn_p50 is not None else None),
        "ttfa_churned_p95_ms": (round(churn_p95, 1)
                                if churn_p95 is not None else None),
        "churned_admissions": len(churn_ttfa),
        "rpc_floor_ms": round(rpc_floor_ms, 1),
        "decode_frames_per_s": round(decode_fps, 1),
        "batch": BATCH,
    }))


def _main_with_claim_retry():
    """The tunneled TPU can be claimed by another tenant; backend init then
    fails with UNAVAILABLE after a ~25 min queue wait. jax caches the failed
    backend for the process lifetime, so retry by re-exec (bounded via env
    counter) instead of looping in-process."""
    try:
        main()
    except RuntimeError as e:
        if "UNAVAILABLE" not in str(e):
            raise
        import sys

        attempt = int(os.environ.get("VOX_BENCH_CLAIM_ATTEMPT", "0"))
        if attempt >= int(os.environ.get("VOX_BENCH_CLAIM_RETRIES", "12")):
            raise
        print(f"TPU unavailable (claim held elsewhere); retry "
              f"{attempt + 1} in 120s", file=sys.stderr, flush=True)
        time.sleep(120)
        os.environ["VOX_BENCH_CLAIM_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_claim_retry()
