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


def _model():
    return Qwen3TTSLM(dtype=jnp.float32, debug_backbone=MID_BACKBONE,
                      debug_depth=MID_DEPTH, debug_codec=MID_CODEC)


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


def _warm(sched, worker, max_tokens):
    """Compile every executable the measured run will hit."""
    for r in _mkreqs(2, max_tokens):
        r.request_id = "w" + r.request_id
        sched.enqueue_request(r)
        while not r.done_all:
            sched._step()
    _drain(sched)
    worker.sync()


def run_online(streams, max_tokens):
    model = _model()
    worker = ModelWorker(model, _wcfg(streams))
    sched = OnlineScheduler(model_worker=worker, max_batch_size=streams,
                            connect=False)
    _warm(sched, worker, max_tokens)
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


def run_disagg(streams, max_tokens):
    if len(jax.devices()) < 2:
        raise SystemExit("need >= 2 (virtual) devices")
    model = _model()
    worker = ModelWorker(model, _wcfg(streams, detok_dev=1))
    sched = DisaggregationScheduler(model_worker=worker,
                                    max_batch_size=streams, connect=False)
    # warmup through the plain step path (same executables; the disagg loops
    # call the same worker methods)
    _warm(sched, worker, max_tokens)
    reqs = _mkreqs(streams, max_tokens)

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
    return nbytes / (2.0 * model.sample_rate), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=60)
    args = ap.parse_args()

    audio_a, wall_a = run_online(args.streams, args.max_tokens)
    audio_b, wall_b = run_disagg(args.streams, args.max_tokens)
    out = {
        "config": {"streams": args.streams, "max_tokens": args.max_tokens,
                   "devices": len(jax.devices()),
                   "platform": jax.devices()[0].platform},
        "online_single_device": {
            "audio_s": round(audio_a, 3), "wall_s": round(wall_a, 3),
            "audio_per_wall": round(audio_a / wall_a, 3)},
        "disaggregated_2dev": {
            "audio_s": round(audio_b, 3), "wall_s": round(wall_b, 3),
            "audio_per_wall": round(audio_b / wall_b, 3)},
        "overlap_win": round((audio_b / wall_b) / (audio_a / wall_a), 3),
    }
    path = Path(__file__).resolve().parent.parent / "artifacts"
    path.mkdir(exist_ok=True)
    (path / "disagg_virtual_r3.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
