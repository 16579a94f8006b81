"""CLI entry: ``python -m vox_serve_tpu.launch`` / ``vox-serve-tpu``.

Flag surface mirrors the reference (launch.py:1114-1204): model selection,
scheduler type, sampling overrides, paging, DP size, disaggregation. The HTTP
server runs on aiohttp; one scheduler daemon subprocess per DP rank owns a
TPU chip.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

from .utils import get_logger, set_global_log_level

logger = get_logger("launch")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="vox_serve_tpu API server")
    p.add_argument("--model", default="dummy",
                   help="model name or HF id (see models.available_models)")
    p.add_argument("--scheduler-type", default="online",
                   choices=["base", "online", "offline", "input_streaming",
                            "disaggregation"])
    p.add_argument("--async-scheduling", action="store_true")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    # None = resolved from the model's serving profile (profiles.py) — the
    # measured-optimal configuration for profiled models
    p.add_argument("--max-batch-size", type=int, default=None)
    p.add_argument("--max-num-pages", type=int, default=None)
    p.add_argument("--page-size", type=int, default=None)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--min-p", type=float, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--max-tokens", type=int, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--repetition-window", type=int, default=None)
    p.add_argument("--cfg-scale", type=float, default=None)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--enable-disaggregation", action="store_true")
    p.add_argument("--enable-pallas", action="store_true")
    p.add_argument("--disable-pallas", action="store_true",
                   help="force the pure-XLA attention path even when the "
                        "model's serving profile enables Pallas")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--pipeline-depth", type=int, default=None,
                   help="in-flight decode steps with deferred readback")
    p.add_argument("--tp-size", type=int, default=1,
                   help="tensor-parallel shards per replica (ICI)")
    p.add_argument("--first-chunk-frames", type=int, default=None,
                   help="emit the first chunk after N frames (TTFA)")
    p.add_argument("--ramp-frames", type=int, default=None,
                   help="extend the mini-chunk ramp to N frames before "
                        "regular detokenize windows (0: one interval)")
    p.add_argument("--fused-decode-steps", type=int, default=None,
                   help="scan N decode steps per dispatch for cold/"
                        "light-load streams (0 disables)")
    p.add_argument("--fused-decode-buckets", default=None,
                   help="comma list of batch buckets served by the fused "
                        "k-step decode executable (include max-batch-size "
                        "to fuse the full decode batch)")
    p.add_argument("--fused-k-schedule", default=None,
                   help="comma list: fused step count per fused-decode "
                        "bucket (e.g. 5,3,3,5 — granularity schedule; "
                        "values <= fused-decode-steps)")
    p.add_argument("--fused-min-batch", type=int, default=None,
                   help="latency/throughput regime boundary: decode batches "
                        "below N run single-step rounds with cold chains + "
                        "mini-chunk ramp; at/above N rounds fuse k steps and "
                        "new streams' first chunk is a full window (0: "
                        "always fuse when eligible)")
    p.add_argument("--detok-pipeline-depth", type=int, default=None,
                   help="in-flight detokenize batches with deferred audio "
                        "readback (>=2 overlaps codec readback with wide "
                        "fused decode)")
    p.add_argument("--enable-profiling", action="store_true",
                   help="jax.profiler trace annotations around worker phases")
    p.add_argument("--dp-size", type=int, default=1)
    p.add_argument("--detokenize-interval", type=int, default=None)
    p.add_argument("--codec-dtype", default=None,
                   help="serve the audio codec at this dtype (bfloat16)")
    p.add_argument("--decode-buckets", default=None,
                   help="comma list overriding the decode-batch lattice")
    p.add_argument("--detok-buckets", default=None,
                   help="comma list overriding the detokenize-batch "
                        "lattice (last may be below max-batch-size)")
    p.add_argument("--detok-frame-budget", type=int, default=None,
                   help="cap on batch*length frames per detokenize "
                        "executable (codec activation temps scale with "
                        "total frames; 0 disables)")
    p.add_argument("--prefill-buckets", default=None,
                   help="comma list of prefill token buckets (a small "
                        "first bucket keeps the single-stream cold chain "
                        "short; larger ones pack churn admissions)")
    p.add_argument("--max-prefill-requests", type=int, default=None,
                   help="max requests packed into one prefill dispatch")
    p.add_argument("--kv-reserve-fraction", type=float, default=None,
                   help="fraction of the worst-case generation budget "
                        "reserved at admission (1.0 = never defer; <1 "
                        "overcommits for concurrency)")
    p.add_argument("--kv-quant", default=None,
                   choices=["none", "f8_e4m3", "int8"],
                   help="quantized KV pool storage (halves KV HBM and "
                        "decode attention DMA bytes; f8_e4m3 needs no "
                        "calibration, int8 uses --kv-k-amax/--kv-v-amax)")
    p.add_argument("--kv-k-amax", type=float, default=None,
                   help="int8 KV: expected |K| absmax (scale = amax/127)")
    p.add_argument("--kv-v-amax", type=float, default=None,
                   help="int8 KV: expected |V| absmax (scale = amax/127)")
    p.add_argument("--weight-quant", default=None,
                   choices=["none", "int8"],
                   help="int8 weight-only quantization of the backbone "
                        "matmuls (halves decode weight streaming; for "
                        "weight-bound families like Orpheus-3B)")
    p.add_argument("--table-width-buckets", default=None,
                   help="comma list of block-table width buckets (pages); "
                        "attention cost tracks the static width, so steps "
                        "run at the smallest bucket covering the batch")
    p.add_argument("--socket-suffix", default="")
    p.add_argument("--log-level", default="info")
    p.add_argument("--timeout-seconds", type=float, default=600.0)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    set_global_log_level(args.log_level)
    from .utils import apply_platform_override

    apply_platform_override()

    # coerce BEFORE the mutual-exclusion check: --scheduler-type
    # disaggregation used to bypass the guard and every pinned daemon died
    # on devices[1] IndexError instead of a clean CLI error
    if args.scheduler_type == "disaggregation" and not args.enable_disaggregation:
        args.enable_disaggregation = True
    if args.dp_size > 1 and args.enable_disaggregation:
        logger.error("--dp-size > 1 and --enable-disaggregation are mutually "
                     "exclusive")
        sys.exit(2)

    # fill unset flags from the model's serving profile (measured optimum)
    from .profiles import apply_profile
    apply_profile(args, logger)
    if args.disable_pallas:
        args.enable_pallas = False
    if args.async_scheduling and args.pipeline_depth >= 2:
        logger.warning(
            "--async-scheduling: decode readback is already pipelined "
            "(pipeline_depth=%d); the flag adds nothing here. It only has "
            "an effect with --pipeline-depth 0/1.", args.pipeline_depth)

    # the model's sample rate drives WAV headers; resolve without building
    # the full model (cheap metadata-only instantiation is model-specific,
    # so consult a static table with a fallback)
    from .models import get_model_class
    cls = get_model_class(args.model)  # validates the name early
    sample_rate = getattr(cls, "SAMPLE_RATE", None) or 24000

    from .server.api import APIServer
    from .server.app import build_app

    scheduler_args = {
        "max_num_pages": args.max_num_pages,
        "page_size": args.page_size,
        "top_p": args.top_p, "top_k": args.top_k, "min_p": args.min_p,
        "temperature": args.temperature, "max_tokens": args.max_tokens,
        "repetition_penalty": args.repetition_penalty,
        "repetition_window": args.repetition_window,
        "cfg_scale": args.cfg_scale, "greedy": args.greedy,
        "async_scheduling": args.async_scheduling,
        "enable_disaggregation": args.enable_disaggregation,
        "enable_pallas": args.enable_pallas,
        "no_warmup": args.no_warmup,
        "pipeline_depth": args.pipeline_depth,
        "tp_size": args.tp_size,
        "first_chunk_frames": args.first_chunk_frames,
        "ramp_frames": args.ramp_frames,
        "fused_decode_steps": args.fused_decode_steps,
        "fused_decode_buckets": args.fused_decode_buckets,
        "fused_k_schedule": args.fused_k_schedule,
        "fused_min_batch": args.fused_min_batch,
        "detok_pipeline_depth": args.detok_pipeline_depth,
        "enable_profiling": args.enable_profiling,
        "detokenize_interval": args.detokenize_interval,
        "codec_dtype": args.codec_dtype,
        "decode_buckets": args.decode_buckets,
        "detok_buckets": args.detok_buckets,
        "detok_frame_budget": args.detok_frame_budget,
        "prefill_buckets": args.prefill_buckets,
        "max_prefill_requests": args.max_prefill_requests,
        "kv_reserve_fraction": args.kv_reserve_fraction,
        "kv_quant": args.kv_quant,
        "kv_k_amax": args.kv_k_amax,
        "kv_v_amax": args.kv_v_amax,
        "weight_quant": args.weight_quant,
        "table_width_buckets": args.table_width_buckets,
        "log_level": args.log_level,
    }
    server = APIServer(
        model_name=args.model,
        scheduler_type=args.scheduler_type,
        max_batch_size=args.max_batch_size,
        dp_size=args.dp_size,
        socket_suffix=args.socket_suffix,
        timeout_seconds=args.timeout_seconds,
        scheduler_args=scheduler_args,
    )

    def _shutdown(signum, frame):
        logger.info("received signal %s, shutting down", signum)
        server.cleanup()
        os._exit(0)

    signal.signal(signal.SIGINT, _shutdown)
    signal.signal(signal.SIGTERM, _shutdown)

    from aiohttp import web

    app = build_app(server, sample_rate=sample_rate)
    logger.info("serving %s on %s:%d", args.model, args.host, args.port)
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
