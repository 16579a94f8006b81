"""Serving profiles: `vox-serve-tpu --model qwen3-tts` alone must reproduce
the measured-optimal bench configuration (VERDICT r2 next-step #4)."""

from vox_serve_tpu.launch import build_parser
from vox_serve_tpu.profiles import apply_profile, resolve_profile


def _resolved(argv):
    args = build_parser().parse_args(argv)
    apply_profile(args)
    if args.disable_pallas:
        args.enable_pallas = False
    return args


def test_qwen3_profile_matches_bench_optimum():
    a = _resolved(["--model", "qwen3-tts"])
    assert a.max_batch_size == 144
    assert a.max_num_pages == 3072
    assert a.page_size == 16
    assert a.codec_dtype == "bfloat16"
    assert a.first_chunk_frames == 3
    assert a.fused_decode_steps == 5
    assert a.fused_decode_buckets == "1,32,96,144"
    assert a.detok_pipeline_depth == 2
    assert a.decode_buckets == "1,32,96,144"
    assert a.detok_buckets == "16,80"
    assert a.prefill_buckets == "64,128,256"
    assert a.max_prefill_requests == 5
    assert a.kv_reserve_fraction == 0.05
    assert a.enable_pallas


def test_explicit_flags_override_profile():
    a = _resolved(["--model", "qwen3-tts", "--max-batch-size", "16",
                   "--codec-dtype", "float32", "--disable-pallas"])
    assert a.max_batch_size == 16
    assert a.codec_dtype == "float32"
    assert not a.enable_pallas
    # untouched keys still come from the profile
    assert a.max_num_pages == 3072


def test_explicit_batch_yields_consistent_worker_config():
    """Regression: --max-batch-size on a profiled model must not carry over
    the profile's 144-scale bucket lattices — WorkerConfig asserts
    decode_buckets[-1] == max_batch_size and the daemon died at startup."""
    from vox_serve_tpu.worker import WorkerConfig

    a = _resolved(["--model", "qwen3-tts", "--max-batch-size", "16"])
    assert a.decode_buckets is None
    assert a.detok_buckets is None
    assert a.fused_decode_buckets is None

    def parse(spec):
        return tuple(int(x) for x in spec.split(",")) if spec else None

    cfg = WorkerConfig(
        max_batch_size=a.max_batch_size,
        decode_buckets_override=parse(a.decode_buckets),
        detok_buckets_override=parse(a.detok_buckets),
        fused_decode_buckets=parse(a.fused_decode_buckets) or (1,),
        fused_decode_steps=a.fused_decode_steps,
    )
    assert cfg.decode_buckets[-1] == 16
    assert cfg.detok_buckets[-1] <= 16


def test_csm_profile_matches_bench():
    """artifacts/csm_bench_r4.json: 34.7 median RTF>=1 streams at this
    configuration on one v5e chip."""
    a = _resolved(["--model", "csm-1b"])
    assert a.max_batch_size == 64
    assert a.max_num_pages == 3072
    assert a.codec_dtype == "bfloat16"
    assert a.fused_decode_steps == 5
    assert a.fused_decode_buckets == "1,64"
    assert a.decode_buckets == "1,64"
    assert a.detok_buckets == "16,64"
    assert a.enable_pallas


def test_orpheus_profile_applied():
    """artifacts/orpheus_bench_r4.json: 12.9 median RTF>=1 streams at this
    configuration on one v5e chip."""
    a = _resolved(["--model", "orpheus-3b"])
    assert a.max_batch_size == 64
    assert a.max_num_pages == 2048
    assert a.codec_dtype == "bfloat16"
    assert a.fused_decode_steps == 5
    assert a.decode_buckets == "1,64"
    assert a.enable_pallas


def test_unprofiled_model_gets_generic_defaults():
    a = _resolved(["--model", "zonos"])
    assert a.max_batch_size == 8
    assert a.max_num_pages == 2048
    assert a.fused_decode_steps == 0
    assert not a.enable_pallas


def test_resolve_profile_substring_match():
    assert resolve_profile("Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice")[
        "max_batch_size"] == 144
    assert resolve_profile("dummy")["max_num_pages"] == 256


def test_equal_explicit_batch_keeps_tuned_lattices():
    """--max-batch-size equal to the profile's own batch must keep the
    tuned bucket lattices (dropping them silently disabled full-batch
    fused decode)."""
    a = _resolved(["--model", "qwen3-tts", "--max-batch-size", "144"])
    assert a.decode_buckets == "1,32,96,144"
    assert a.fused_decode_buckets == "1,32,96,144"
    assert a.detok_buckets == "16,80"


def test_explicit_decode_buckets_imply_batch():
    """--decode-buckets without --max-batch-size: the buckets' tail implies
    the batch (the profile's 144 would violate the WorkerConfig invariant
    and kill the daemon via bare assert)."""
    a = _resolved(["--model", "qwen3-tts", "--decode-buckets", "1,32"])
    assert a.max_batch_size == 32
    assert a.decode_buckets == "1,32"
    # other batch-scaled profile keys dropped (derive for batch 32)
    assert a.detok_buckets is None
    assert a.fused_decode_buckets is None
