"""Per-model serving profiles: the measured-optimal launch configuration,
applied by ``launch.py`` when the corresponding flags are unset.

Round-2/3 benchmarking (artifacts/bench_progression_r2.md,
artifacts/ttfa_fix_r3.md) found the production operating point for the
Qwen3-TTS flagship on one TPU v5e; before this module those settings lived
only in ``bench.py`` env defaults while ``vox-serve-tpu`` started at batch 8
/ f32 codec / no first-chunk ramp (VERDICT r2 weak #9). Explicit CLI flags
always win over the profile.
"""

from __future__ import annotations

from typing import Any

#: generic fallbacks (previous CLI defaults) for models without a profile
DEFAULT_PROFILE: dict[str, Any] = {
    "max_batch_size": 8,
    "max_num_pages": 2048,
    "page_size": 16,
    "pipeline_depth": 2,
    "first_chunk_frames": 0,
    "ramp_frames": 0,
    "fused_decode_steps": 0,
    "fused_decode_buckets": None,
    "fused_k_schedule": None,
    "fused_min_batch": None,
    "detok_pipeline_depth": 1,
    "codec_dtype": None,
    "decode_buckets": None,
    "detok_buckets": None,
    "prefill_buckets": None,
    "max_prefill_requests": None,
    "kv_reserve_fraction": None,
    "table_width_buckets": None,
    "enable_pallas": False,
}

#: substring of the resolved model name -> tuned profile
SERVING_PROFILES: dict[str, dict[str, Any]] = {
    # Measured optimum, Qwen3-TTS-1.7B on one v5e chip (round 4: 162.3
    # median churned RTF>=1 streams, decode 4245 frames/s, idle TTFA p50
    # 78 ms — artifacts/bench_progression_r4.md): batch 144, 3072 x
    # 16-token pages, bf16 codec, bucketed block-table widths, 3-frame
    # first chunk through the single-dispatch cold chain with a 64-token
    # small prefill bucket, full-batch fused k=5 decode.
    "qwen3": {
        "max_batch_size": 144,
        "max_num_pages": 3072,
        "page_size": 16,
        "pipeline_depth": 2,
        "first_chunk_frames": 3,
        # full-batch fused decode: k=5 steps per dispatch round amortizes
        # the fixed per-round dispatch/queue cost; detok lattice and the
        # burst-smoothing cap scale with k (16,80 covers ceil(144*5/10))
        "fused_decode_steps": 5,
        # intermediate buckets: at light load (e.g. goodput rate 1.0 ~ 20
        # live streams) padding every fused round to B=144 priced rounds at
        # 167 ms and queued admissions behind them — HTTP TTFA p50 ~1.0 s
        # (artifacts/goodput_tpu_r4.json, first run). B=32/96 rounds cost
        # ~3x less, cutting both admission wait and viability pressure.
        "fused_decode_buckets": "1,32,96,144",
        # granularity schedule: k=5 for a near-idle stream (dispatch
        # amortization; chunks fly regardless), k=2 through the 32/96
        # buckets (~55-120 ms rounds; chunk 2 of the mini ramp rides TWO
        # rounds of the pipeline, so round time is the early-chunk deadline
        # budget — k=3 left it ~20-40 ms late, run9 late-chunk telemetry),
        # k=5 at the full batch (throughput). Replaces the k=1->5 regime
        # cliff that produced the rate-2/4 all-chunks viability dip (62/60%
        # vs 95%+ on either side, artifacts/goodput_tpu_r5_run4.json);
        # decode headroom at k=2: B=96 rounds ~95 ms produce ~2000
        # frames/s vs ~1150 demanded at full 96-bucket load
        "fused_k_schedule": "5,2,2,5",
        # regime boundary: 65 = where k=2 rounds stop covering demand (the
        # detok co-tenant jumps to the 80-bucket ~70 streams, and 96-bucket
        # k=2 decode+detok rounds fall under the frame demand). Below it:
        # latency regime (mini ramp, cold chains, scheduled k). At/above:
        # throughput regime (full-window first chunks, max-k rounds).
        # Measured: rates 1-2 (loads <=42) hit p50 165 ms / 95%+ all-chunks
        # in the latency zone (goodput run10), rates 4+ need max-k rounds
        "fused_min_batch": 65,
        "detok_pipeline_depth": 2,
        "codec_dtype": "bfloat16",
        "decode_buckets": "1,32,96,144",
        "detok_buckets": "16,80",
        "prefill_buckets": "64,128,256",
        "max_prefill_requests": 5,
        "kv_reserve_fraction": 0.05,
        "enable_pallas": True,
    },
    # Measured on one v5e chip (artifacts/csm_bench_r4.json: 144.3 median
    # RTF>=1 streams, decode 2925 frames/s, idle TTFA p50 145 ms): the
    # padded-to-128 combined KV layout cut the B=64 decode step from
    # 116 -> 22.6 ms (attention 94.5 -> 4.7 ms; the old per-(head,page)
    # fold kernel was DMA-latency-bound at D=64). The remaining step is
    # depth-scan-bound (13.2 ms of 22.6, at its weight-streaming floor,
    # artifacts/csm_depth_r4.md). Mimi's 12.5 Hz frame rate means each
    # stream needs only 12.5 frames/s, so B=64 holds RTF>=1 for ~144
    # churned streams.
    "csm": {
        "max_batch_size": 64,
        "max_num_pages": 3072,
        "page_size": 16,
        "pipeline_depth": 2,
        "first_chunk_frames": 3,
        "fused_decode_steps": 5,
        "fused_decode_buckets": "1,64",
        "detok_pipeline_depth": 2,
        "codec_dtype": "bfloat16",
        "decode_buckets": "1,64",
        "detok_buckets": "16,64",
        "prefill_buckets": "64,128,256",
        "max_prefill_requests": 5,
        "kv_reserve_fraction": 0.05,
        "enable_pallas": True,
    },
    # Measured on one v5e chip (artifacts/orpheus_bench_r4.json: 12.9
    # median RTF>=1 streams, spread 7.5%, idle TTFA p50 155 ms, decode
    # 1317 frames/s at B=64): Orpheus-3B is backbone-weight-stream-bound
    # (7.07G bf16 params; fused k=5 B=64 round = 231-266 ms) — batch 64
    # with 2048 pages fits the 3B KV (112 KB/token) beside the params.
    # SNAC detokenize is cheap (13.4 ms at B=16); capacity scales with
    # how long streams live (churn admission costs ~2.7 s at saturation),
    # so serve long-form utterances where possible.
    "orpheus": {
        "max_batch_size": 64,
        "max_num_pages": 2048,
        "page_size": 16,
        "pipeline_depth": 2,
        "first_chunk_frames": 3,
        "fused_decode_steps": 5,
        "fused_decode_buckets": "1,64",
        "detok_pipeline_depth": 2,
        "codec_dtype": "bfloat16",
        "decode_buckets": "1,64",
        "detok_buckets": "16,64",
        "prefill_buckets": "64,128,256",
        "max_prefill_requests": 5,
        "kv_reserve_fraction": 0.05,
        "enable_pallas": True,
    },
    # CPU-runnable dev model: small everything, quick warmup
    "dummy": {
        "max_batch_size": 8,
        "max_num_pages": 256,
        "page_size": 8,
    },
}


def resolve_profile(model_name: str) -> dict[str, Any]:
    """Profile for a model name (first substring match), over the generic
    defaults."""
    prof = dict(DEFAULT_PROFILE)
    low = (model_name or "").lower()
    for key, overrides in SERVING_PROFILES.items():
        if key in low:
            prof.update(overrides)
            break
    return prof


#: profile entries whose values are scaled to the profile's max_batch_size;
#: applying them verbatim under an explicit --max-batch-size would violate
#: WorkerConfig's bucket invariants (decode_buckets[-1] == max_batch_size)
#: and crash the scheduler daemon at startup.
_BATCH_SCALED_KEYS = ("decode_buckets", "detok_buckets",
                      "fused_decode_buckets", "fused_k_schedule")


def apply_profile(args, logger=None) -> None:
    """Fill unset (None) argparse flags from the model's serving profile.
    ``enable_pallas`` composes with ``--disable-pallas``."""
    prof = resolve_profile(args.model)
    user_batch = getattr(args, "max_batch_size", None) is not None
    # --max-batch-size equal to the profile's own batch keeps the tuned
    # lattices (dropping them silently disabled full-batch fused decode)
    conflicting_batch = (user_batch
                         and args.max_batch_size != prof.get("max_batch_size"))
    # explicit --decode-buckets without --max-batch-size: the profile's
    # batch would violate WorkerConfig's buckets[-1] == max_batch_size
    # invariant (bare assert killed the daemon) — the buckets imply the
    # batch instead
    user_decode_buckets = getattr(args, "decode_buckets", None)
    if user_decode_buckets and not user_batch:
        args.max_batch_size = int(str(user_decode_buckets).split(",")[-1])
        conflicting_batch = (
            args.max_batch_size != prof.get("max_batch_size"))
        if logger is not None:
            logger.info("--decode-buckets implies --max-batch-size %d",
                        args.max_batch_size)
    applied = {}
    for key, value in prof.items():
        if key == "enable_pallas":
            continue
        if conflicting_batch and key in _BATCH_SCALED_KEYS:
            # explicit batch size differing from the profile's: its bucket
            # lattices are scaled to ITS batch; leave these unset so the
            # worker derives a consistent lattice for the requested batch
            continue
        if getattr(args, key, None) is None:
            setattr(args, key, value)
            if value != DEFAULT_PROFILE.get(key):
                applied[key] = value
    if not args.enable_pallas and not getattr(args, "disable_pallas", False) \
            and prof.get("enable_pallas"):
        args.enable_pallas = True
        applied["enable_pallas"] = True
    if applied and logger is not None:
        logger.info("serving profile for %r: %s (explicit flags override)",
                    args.model,
                    " ".join(f"{k}={v}" for k, v in sorted(applied.items())))
