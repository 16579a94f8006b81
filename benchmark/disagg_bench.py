"""LM/detokenizer disaggregation A/B on a 2-device virtual mesh.

VERDICT r2 item 3b: the disaggregation scheduler had never been *measured*,
only functionally tested. This script runs the same mid-size Qwen3-TTS
config (hidden 256 x 8 layers — large enough that LM and codec steps are
milliseconds, small enough to compile in seconds on CPU) through

  a) the online scheduler, LM + detokenizer time-sharing ONE device, and
  b) the disaggregation scheduler, LM on device 0 / codec on device 1 with
     the two asyncio loops overlapping in wall-clock,

and reports audio-throughput for each plus the overlap win. On real
hardware the two devices are separate chips joined by ICI and the win is
bounded by the detok share of chip time (~30-40% at the serving knee, see
artifacts/bench_progression_r2.md). On the virtual CPU mesh the number is
a LOWER BOUND in two ways: both "devices" share host cores, and the CPU
backend executes compute synchronously inside the dispatch call, so the
worker's dispatch lock (which serializes only microsecond host bookkeeping
on TPU, where dispatch is async) serializes the full compute here. Expect
overlap_win <= 1 on CPU; the run demonstrates correctness of the
disaggregated path, not its speedup.

Run:  python benchmark/disagg_bench.py  [--streams 8] [--max-tokens 60]
Writes artifacts/disagg_virtual_r3.json.
"""

import argparse
import asyncio
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.codecs.qwen3_codec import Qwen3CodecConfig  # noqa: E402
from vox_serve_tpu.models.backbone import BackboneConfig  # noqa: E402
from vox_serve_tpu.models.depth import DepthConfig  # noqa: E402
from vox_serve_tpu.models.qwen3_tts import Qwen3TTSLM  # noqa: E402
from vox_serve_tpu.requests import Request  # noqa: E402
from vox_serve_tpu.sampling import SamplingConfig  # noqa: E402
from vox_serve_tpu.scheduler.disaggregation import (  # noqa: E402
    DisaggregationScheduler,
)
from vox_serve_tpu.scheduler.online import OnlineScheduler  # noqa: E402
from vox_serve_tpu.worker import ModelWorker, WorkerConfig  # noqa: E402

MID_BACKBONE = BackboneConfig(
    vocab_size=3072, hidden_size=256, num_layers=8, num_heads=4,
    num_kv_heads=2, head_dim=64, intermediate_size=512, qk_norm=True,
    rope_theta=1e6, dtype=jnp.float32,
)
MID_DEPTH = DepthConfig(
    hidden_size=128, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
    intermediate_size=256, max_seq=17, qk_norm=True, dtype=jnp.float32,
)
MID_CODEC = Qwen3CodecConfig(
    codebook_dim=64, codebook_size=2048, latent_dim=96, decoder_dim=192,
    hidden_size=96, intermediate_size=192, head_dim=32, num_heads=4,
    num_kv_heads=4, num_layers=4, num_quantizers=16, sliding_window=48,
    upsample_rates=(4, 3), upsampling_ratios=(2, 2), vq_dim=32,
)


TINY_BACKBONE = BackboneConfig(
    vocab_size=3072, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, qk_norm=True,
    rope_theta=1e6, dtype=jnp.float32,
)
TINY_DEPTH = DepthConfig(
    hidden_size=32, num_layers=1, num_heads=2, num_kv_heads=2, head_dim=16,
    intermediate_size=64, max_seq=17, qk_norm=True, dtype=jnp.float32,
)
TINY_CODEC = Qwen3CodecConfig(
    codebook_dim=32, codebook_size=2048, latent_dim=32, decoder_dim=64,
    hidden_size=32, intermediate_size=64, head_dim=16, num_heads=2,
    num_kv_heads=2, num_layers=1, num_quantizers=16, sliding_window=24,
    upsample_rates=(4, 3), upsampling_ratios=(2, 2), vq_dim=16,
)

_TINY = False


def _model():
    if _TINY:
        return Qwen3TTSLM(dtype=jnp.float32, debug_backbone=TINY_BACKBONE,
                          debug_depth=TINY_DEPTH, debug_codec=TINY_CODEC)
    return Qwen3TTSLM(dtype=jnp.float32, debug_backbone=MID_BACKBONE,
                      debug_depth=MID_DEPTH, debug_codec=MID_CODEC)


#: wall-clock busy intervals of injected "device time": (tag, start, end)
_INTERVALS: list[tuple] = []


def _inject_costs(worker, lm_ms: float, detok_ms: float,
                  prefill_ms: float) -> None:
    """Wrap the worker's dispatch methods with sleeps that model the TPU
    per-phase device costs (measured r4: decode B=144 35 ms/step,
    detokenize B=80x10 109 ms — scaled to the virtual batch). The sleep
    runs AFTER the real (tiny, CPU) dispatch returns, outside the worker's
    dispatch lock — exactly like async device execution on a real chip:
    the host thread that issued the work 'owns' the device for that span.
    On the 2-loop disaggregation scheduler the LM and detok sleeps run on
    different executor threads (= different chips) and may overlap; on the
    single-device online scheduler they serialize in the one step loop."""
    import functools

    def wrap(name, cost_ms):
        orig = getattr(worker, name)

        @functools.wraps(orig)
        def wrapper(*a, **k):
            out = orig(*a, **k)
            t0 = time.perf_counter()
            time.sleep(cost_ms / 1e3)
            _INTERVALS.append((name, t0, time.perf_counter()))
            return out

        setattr(worker, name, wrapper)

    wrap("run_lm_decode", lm_ms)
    wrap("run_lm_decode_multi", lm_ms)
    wrap("run_lm_prefill", prefill_ms)
    wrap("run_detokenize", detok_ms)


def _overlap_stats() -> dict:
    """Wall time where an LM-phase interval and a detok-phase interval were
    simultaneously 'on device' (the quantity disaggregation exists to
    create), plus per-phase busy totals."""
    lm = sorted((s, e) for n, s, e in _INTERVALS if n != "run_detokenize")
    dt = sorted((s, e) for n, s, e in _INTERVALS if n == "run_detokenize")
    overlap = 0.0
    i = j = 0
    while i < len(lm) and j < len(dt):
        s = max(lm[i][0], dt[j][0])
        e = min(lm[i][1], dt[j][1])
        if e > s:
            overlap += e - s
        if lm[i][1] < dt[j][1]:
            i += 1
        else:
            j += 1
    return {
        "lm_busy_s": round(sum(e - s for s, e in lm), 3),
        "detok_busy_s": round(sum(e - s for s, e in dt), 3),
        "lm_detok_overlap_s": round(overlap, 3),
    }


def _wcfg(batch, detok_dev=None):
    return WorkerConfig(
        max_batch_size=batch, num_pages=256, page_size=16,
        prefill_token_buckets=(64,), max_prefill_requests=1,
        warmup=False, pipeline_depth=2, use_pallas=False,
        detokenizer_device_index=detok_dev,
    )


def _mkreqs(n, max_tokens):
    return [Request(request_id=f"r{i}", prompt="disaggregation benchmark",
                    is_streaming=True,
                    sampling_config=SamplingConfig(max_tokens=max_tokens))
            for i in range(n)]


def _drain(sched):
    n = 0
    for msg in sched._inproc_results:
        _, typ, body = msg.split(b"|", 2)
        if typ == b"AUDIO":
            n += len(body)
    sched._inproc_results.clear()
    return n


def _warm(sched, worker, max_tokens, streams=2):
    """Compile every executable the measured run will hit — the FULL
    concurrent batch (bucket/width shapes compile per batch size; a 2-stream
    warm left the 8-stream decode/detok shapes compiling inside the measured
    window, ~30 s of CPU compile wall that drowned the injected costs)."""
    reqs = _mkreqs(streams, max_tokens)
    for r in reqs:
        r.request_id = "w" + r.request_id
        sched.enqueue_request(r)
    t0 = time.perf_counter()
    while not all(r.done_all for r in reqs) and time.perf_counter() - t0 < 600:
        sched._step()
        _drain(sched)
    _drain(sched)
    worker.sync()


def run_online(streams, max_tokens, inject=None):
    model = _model()
    worker = ModelWorker(model, _wcfg(streams))
    sched = OnlineScheduler(model_worker=worker, max_batch_size=streams,
                            connect=False)
    _warm(sched, worker, max_tokens, streams=streams)
    if inject:
        _INTERVALS.clear()
        _inject_costs(worker, *inject)
    reqs = _mkreqs(streams, max_tokens)
    for r in reqs:
        sched.enqueue_request(r)
    t0 = time.perf_counter()
    nbytes = 0
    while not all(r.done_all for r in reqs):
        sched._step()
        nbytes += _drain(sched)
    worker.sync()
    nbytes += _drain(sched)
    wall = time.perf_counter() - t0
    return nbytes / (2.0 * model.sample_rate), wall


def run_disagg(streams, max_tokens, inject=None):
    if len(jax.devices()) < 2:
        raise SystemExit("need >= 2 (virtual) devices")
    model = _model()
    worker = ModelWorker(model, _wcfg(streams, detok_dev=1))
    sched = DisaggregationScheduler(model_worker=worker,
                                    max_batch_size=streams, connect=False)
    # warmup through the plain step path (same executables; the disagg loops
    # call the same worker methods)
    _warm(sched, worker, max_tokens, streams=streams)
    if inject:
        _INTERVALS.clear()
        _inject_costs(worker, *inject)
    reqs = _mkreqs(streams, max_tokens)
    queue_trace = []

    async def main():
        sched._detok_queue = asyncio.Queue()
        sched._lock = asyncio.Lock()
        for r in reqs:
            sched.enqueue_request(r)
        t0 = time.perf_counter()
        tasks = [asyncio.create_task(sched._lm_loop()),
                 asyncio.create_task(sched._detokenizer_loop())]
        nbytes = 0
        while not all(r.done_all for r in reqs):
            await asyncio.sleep(0.002)
            queue_trace.append((round(time.perf_counter() - t0, 3),
                                sched._detok_queue.qsize()))
            async with sched._lock:
                nbytes += _drain(sched)
        # done_all is set on the detok executor thread BEFORE the detok
        # coroutine re-acquires the lock and emits the final window's
        # bytes; cancelling immediately lost up to one window per stream
        # (biased the disagg variant low vs the synchronous online A-run)
        for _ in range(200):
            await asyncio.sleep(0.005)
            if sched._detok_queue.empty():
                async with sched._lock:
                    drained = _drain(sched)
                nbytes += drained
                if drained == 0:
                    break
        for t in tasks:
            t.cancel()
        worker.sync()
        flush = getattr(worker, "flush_detokenize", None)
        if flush is not None:
            async with sched._lock:
                sched._send_responses(flush())
        nbytes += _drain(sched)
        return nbytes, time.perf_counter() - t0

    nbytes, wall = asyncio.run(main())
    return nbytes / (2.0 * model.sample_rate), wall, queue_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=60)
    ap.add_argument("--inject", default=None,
                    help="lm_ms,detok_ms,prefill_ms — wrap the worker's "
                         "dispatch methods with sleeps modelling measured "
                         "TPU per-phase device costs (see _inject_costs); "
                         "the virtual run then demonstrates whether the "
                         "disaggregation loops actually OVERLAP those costs")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model so the injected costs dominate wall "
                         "time (the mid model's real CPU compute otherwise "
                         "drowns them)")
    ap.add_argument("--variant", choices=["online", "disagg"], default=None,
                    help="internal: run ONE variant in this process and "
                         "print its partial JSON. Each variant needs a "
                         "fresh process: a second live worker in the same "
                         "process contaminated the second variant's timing "
                         "(disagg wall 1.2 s alone vs 9.7 s after the "
                         "online run)")
    args = ap.parse_args()
    global _TINY
    _TINY = args.tiny
    inject = (tuple(float(x) for x in args.inject.split(","))
              if args.inject else None)

    if args.variant == "online":
        audio, wall = run_online(args.streams, args.max_tokens,
                                 inject=inject)
        queue_trace = None
    elif args.variant == "disagg":
        audio, wall, queue_trace = run_disagg(args.streams, args.max_tokens,
                                              inject=inject)
    if args.variant:
        part = {
            "audio_s": round(audio, 3), "wall_s": round(wall, 3),
            "audio_per_wall": round(audio / wall, 3),
            "phase_busy": _overlap_stats() if inject else None,
        }
        if queue_trace is not None:
            part["detok_queue_depth_trace"] = queue_trace[::25][:60]
        print(json.dumps(part))
        return

    # orchestrate: one fresh subprocess per variant
    import subprocess

    base = [sys.executable, __file__, "--streams", str(args.streams),
            "--max-tokens", str(args.max_tokens)]
    if args.tiny:
        base.append("--tiny")
    if args.inject:
        base += ["--inject", args.inject]
    parts = {}
    for variant in ("online", "disagg"):
        proc = subprocess.run(base + ["--variant", variant],
                              capture_output=True, text=True, timeout=900)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if not lines:
            raise SystemExit(f"{variant} variant failed:\n{proc.stderr[-2000:]}")
        parts[variant] = json.loads(lines[-1])
    a, b = parts["online"], parts["disagg"]
    out = {
        "config": {"streams": args.streams, "max_tokens": args.max_tokens,
                   "injected_costs_ms": inject, "tiny": args.tiny},
        "online_single_device": a,
        "disaggregated_2dev": b,
        "overlap_win": round(b["audio_per_wall"] / a["audio_per_wall"], 3),
    }
    path = Path(__file__).resolve().parent.parent / "artifacts"
    path.mkdir(exist_ok=True)
    name = ("disagg_virtual_injected_r4.json" if inject
            else "disagg_virtual_r3.json")
    (path / name).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
