"""Scheduler daemon subprocess entry: ``python -m vox_serve_tpu.scheduler_entry``.

Parity with reference scheduler_entry.py: this module must NOT import jax at
module scope — the parent sets TPU device-pinning env vars
(TPU_VISIBLE_DEVICES etc., the CUDA_VISIBLE_DEVICES analogue) before spawning,
and they must be in place before the JAX runtime initializes.
"""

from __future__ import annotations

import argparse
import sys

from .utils import apply_platform_override, get_logger, set_global_log_level


def _run_scheduler_daemon(args) -> None:
    import faulthandler
    import signal

    faulthandler.enable()  # dump python stacks on SIGSEGV/SIGILL/SIGABRT
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    apply_platform_override()
    logger = get_logger("scheduler_entry")
    logger.info("scheduler daemon starting (rank %d, model %s)",
                args.rank, args.model)

    # JAX import happens here, after env pinning by the parent
    from .models import load_model
    from .scheduler import load_scheduler
    from .worker import ModelWorker, WorkerConfig

    model = load_model(
        args.model,
        top_p=args.top_p, top_k=args.top_k, min_p=args.min_p,
        temperature=args.temperature, max_tokens=args.max_tokens,
        repetition_penalty=args.repetition_penalty,
        repetition_window=args.repetition_window,
        cfg_scale=args.cfg_scale, greedy=args.greedy,
        detokenize_interval=args.detokenize_interval,
    )
    # --async-scheduling (the reference's overlapped batch selection,
    # scheduler/base.py:168-215) maps to decode pipelining here: JAX's async
    # dispatch already overlaps host scheduling with device execution, and
    # pipeline_depth defers the sampled-token readback.
    pipeline_depth = args.pipeline_depth
    if args.async_scheduling and pipeline_depth == 0:
        pipeline_depth = 2

    wcfg = WorkerConfig(
        max_batch_size=args.max_batch_size,
        num_pages=args.max_num_pages,
        page_size=args.page_size,
        use_pallas=args.enable_pallas,
        warmup=not args.no_warmup,
        pipeline_depth=pipeline_depth,
        tp_size=args.tp_size,
        first_chunk_frames=args.first_chunk_frames,
        ramp_frames=args.ramp_frames,
        fused_decode_steps=args.fused_decode_steps,
        fused_decode_buckets=(
            _parse_buckets(args.fused_decode_buckets) or (1,)),
        fused_k_schedule=_parse_buckets(args.fused_k_schedule) or None,
        fused_min_batch=args.fused_min_batch or None,
        detok_pipeline_depth=args.detok_pipeline_depth,
        enable_profiling=args.enable_profiling,
        detokenizer_device_index=(1 if args.enable_disaggregation else None),
        codec_dtype=args.codec_dtype,
        decode_buckets_override=_parse_buckets(args.decode_buckets),
        detok_buckets_override=_parse_buckets(args.detok_buckets),
        **({"detok_frame_budget": args.detok_frame_budget}
           if args.detok_frame_budget is not None else {}),
        **({"prefill_token_buckets": _parse_buckets(args.prefill_buckets)}
           if args.prefill_buckets else {}),
        **({"max_prefill_requests": args.max_prefill_requests}
           if args.max_prefill_requests is not None else {}),
        **({"kv_reserve_fraction": args.kv_reserve_fraction}
           if args.kv_reserve_fraction is not None else {}),
        **({"kv_quant": args.kv_quant}
           if args.kv_quant is not None else {}),
        **({"kv_k_amax": args.kv_k_amax}
           if args.kv_k_amax is not None else {}),
        **({"kv_v_amax": args.kv_v_amax}
           if args.kv_v_amax is not None else {}),
        **({"weight_quant": args.weight_quant}
           if args.weight_quant is not None else {}),
        table_width_buckets=_parse_buckets(args.table_width_buckets),
    )
    worker = ModelWorker(model, wcfg, rank=args.rank)
    scheduler = load_scheduler(
        args.scheduler_type,
        model_worker=worker,
        max_batch_size=args.max_batch_size,
        rank=args.rank,
        socket_suffix=args.socket_suffix,
        async_scheduling=args.async_scheduling,
    )
    scheduler.run_forever()


def _parse_buckets(spec):
    if not spec:
        return None
    return tuple(int(x) for x in str(spec).split(",") if x)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="vox_serve_tpu scheduler daemon")
    p.add_argument("--model", required=True)
    p.add_argument("--scheduler-type", default="base")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--max-batch-size", type=int, default=8)
    p.add_argument("--max-num-pages", type=int, default=2048)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--socket-suffix", default="")
    p.add_argument("--async-scheduling", action="store_true")
    p.add_argument("--enable-disaggregation", action="store_true")
    p.add_argument("--enable-pallas", action="store_true")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--pipeline-depth", type=int, default=0)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--first-chunk-frames", type=int, default=0)
    p.add_argument("--ramp-frames", type=int, default=0)
    p.add_argument("--fused-decode-steps", type=int, default=0)
    p.add_argument("--fused-k-schedule", default="")
    p.add_argument("--fused-min-batch", type=int, default=0)
    p.add_argument("--fused-decode-buckets", default=None,
                   help="comma list of batch buckets served by the fused "
                        "k-step decode executable (include max-batch-size "
                        "to fuse the full decode batch)")
    p.add_argument("--detok-pipeline-depth", type=int, default=1,
                   help="in-flight detokenize batches with deferred audio "
                        "readback")
    p.add_argument("--enable-profiling", action="store_true")
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--min-p", type=float, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--max-tokens", type=int, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--repetition-window", type=int, default=None)
    p.add_argument("--cfg-scale", type=float, default=None)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--detokenize-interval", type=int, default=None)
    p.add_argument("--codec-dtype", default=None,
                   help="serve the audio codec at this dtype (bfloat16)")
    p.add_argument("--decode-buckets", default=None,
                   help="comma list overriding the decode-batch lattice")
    p.add_argument("--detok-buckets", default=None,
                   help="comma list overriding the detokenize-batch lattice "
                        "(last entry may be below max-batch-size: wider "
                        "batches split)")
    p.add_argument("--detok-frame-budget", type=int, default=None,
                   help="cap on batch*length frames per detokenize "
                        "executable (0 disables)")
    p.add_argument("--prefill-buckets", default=None,
                   help="comma list of prefill token buckets")
    p.add_argument("--max-prefill-requests", type=int, default=None)
    p.add_argument("--kv-reserve-fraction", type=float, default=None)
    p.add_argument("--kv-quant", default=None,
                   choices=["none", "f8_e4m3", "int8"],
                   help="quantized KV pool storage")
    p.add_argument("--kv-k-amax", type=float, default=None)
    p.add_argument("--kv-v-amax", type=float, default=None)
    p.add_argument("--weight-quant", default=None,
                   choices=["none", "int8"])
    p.add_argument("--table-width-buckets", default=None,
                   help="comma list of block-table width buckets (pages)")
    p.add_argument("--log-level", default="info")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    set_global_log_level(args.log_level)
    try:
        _run_scheduler_daemon(args)
    except KeyboardInterrupt:
        sys.exit(0)


if __name__ == "__main__":
    main()
