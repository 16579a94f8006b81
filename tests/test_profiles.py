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
    assert a.first_chunk_frames == 5
    assert a.fused_decode_steps == 5
    assert a.fused_decode_buckets == "1,144"
    assert a.detok_pipeline_depth == 2
    assert a.decode_buckets == "1,144"
    assert a.detok_buckets == "16,80"
    assert a.enable_pallas


def test_explicit_flags_override_profile():
    a = _resolved(["--model", "qwen3-tts", "--max-batch-size", "16",
                   "--codec-dtype", "float32", "--disable-pallas"])
    assert a.max_batch_size == 16
    assert a.codec_dtype == "float32"
    assert not a.enable_pallas
    # untouched keys still come from the profile
    assert a.max_num_pages == 3072


def test_unprofiled_model_gets_generic_defaults():
    a = _resolved(["--model", "orpheus"])
    assert a.max_batch_size == 8
    assert a.max_num_pages == 2048
    assert a.fused_decode_steps == 0
    assert not a.enable_pallas


def test_resolve_profile_substring_match():
    assert resolve_profile("Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice")[
        "max_batch_size"] == 144
    assert resolve_profile("dummy")["max_num_pages"] == 256
