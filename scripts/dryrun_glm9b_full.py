"""Full-shape GLM-4-Voice-9B TP=4 serving dryrun on a virtual CPU mesh.

VERDICT r4 next-step #7 (second half): the r4 multichip dryrun validated
the TP path only at dev-scale dims ("params 0.08G"), so shape/sharding
bugs that appear only at real 9B dimensions (40 layers, H=4096,
inter=13696, vocab=168960, KH=2 — /root/reference/vox_serve/model/
glm_voice.py:65-120) could hide. This runs the REAL serving path
(ModelWorker prefill -> decode) with the full-size random-weight backbone
Megatron-sharded over a tp=4 CPU mesh and the KV pool replicated (KH=2 is
not divisible by tp=4; see worker/base.py), and records per-device param
bytes to corroborate tests/test_glm9b_budget.py's eval_shape proof.

Run (slow, ~10-20 min on 1 CPU core, needs ~25 GB RAM):
    python scripts/dryrun_glm9b_full.py
Writes artifacts/glm9b_full_dryrun_r5.json.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=4").strip()
if "collective_call_terminate" not in _flags:
    # on a single host core, one virtual device's multi-TFLOP prefill GEMM
    # thunk can hold the core past XLA-CPU's default 40 s collective
    # rendezvous termination while its TP peers wait at an all-gather
    # (observed: rendezvous.cc "Termination timeout ... exceeded" crash)
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = _flags
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# JAX_PLATFORMS env alone is not enough under the axon sitecustomize (it
# registers the TPU backend at interpreter start); force CPU the way
# tests/conftest.py does or the 19 GiB init lands on the 16 GiB TPU
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

TP = 4
DECODE_STEPS = 3


def main() -> None:
    from vox_serve_tpu.codecs.glm_flow import GLMFlowConfig
    from vox_serve_tpu.codecs.hifigan import HiFTConfig
    from vox_serve_tpu.models.backbone import BackboneConfig
    from vox_serve_tpu.models.glm_voice import GLMVoiceLM
    from vox_serve_tpu.requests import Request
    from vox_serve_tpu.sampling import SamplingConfig
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    devices = jax.local_devices(backend="cpu")
    assert len(devices) >= TP, f"need {TP} cpu devices, have {len(devices)}"

    # REAL 9B dims (matches GLMVoiceLM's default config and
    # tests/test_glm9b_budget.py); codec stays at dev scale — the thing
    # under test is the sharded backbone at full dimensions
    bb = BackboneConfig(
        vocab_size=168960, hidden_size=4096, num_layers=40,
        num_heads=32, num_kv_heads=2, head_dim=128,
        intermediate_size=13696, qkv_bias=True,
        rope_theta=10000.0, rope_dim=64, rope_interleaved=True,
        rms_eps=1.5625e-07, dtype=jnp.bfloat16)
    flow = GLMFlowConfig(
        input_size=32, output_size=32, heads=4, linear_units=64,
        num_blocks=1, vocab_size=16384, spk_dim=8, mel_dim=16,
        est_channels=(16, 16), est_head_dim=8, est_heads=2, est_n_blocks=1,
        est_mid_blocks=1, n_timesteps=2, regulator_layers=1)
    hift = HiFTConfig(in_channels=16, base_channels=32, nb_harmonics=2,
                      upsample_rates=(8, 5, 3),
                      upsample_kernel_sizes=(16, 11, 7), f0_cond_channels=16)

    t0 = time.monotonic()
    print("initializing full 9B random backbone (~19 GB bf16)...", flush=True)
    model = GLMVoiceLM(dtype=jnp.bfloat16, debug_backbone=bb,
                       debug_flow=flow, debug_hift=hift)
    model.sampling_config = SamplingConfig(greedy=True, max_tokens=256)
    init_s = time.monotonic() - t0
    total_bytes = sum(a.nbytes for a in jax.tree.leaves(model.params))
    print(f"params {total_bytes / 2**30:.2f} GiB in {init_s:.0f}s", flush=True)

    t0 = time.monotonic()
    wcfg = WorkerConfig(
        max_batch_size=2, num_pages=128, page_size=16,
        # GLM's prompt template (system prompt + audio placeholder) is ~270
        # dev-tokenizer tokens for even a short text — 128 failed the run
        prefill_token_buckets=(512,), max_prefill_requests=2,
        warmup=False, tp_size=TP, devices=tuple(devices[:TP]))
    worker = ModelWorker(model, wcfg)
    shard_s = time.monotonic() - t0

    # per-device accounting from the LIVE sharded arrays (not eval_shape)
    def dev0_bytes(tree):
        n = 0
        for a in jax.tree.leaves(tree):
            db = a.sharding.shard_shape(a.shape)
            n += int(np.prod(db)) * a.dtype.itemsize
        return n

    bb_dev = dev0_bytes(model.params["backbone"])
    all_dev = dev0_bytes(model.params)
    kv_shard = worker.k_pages.sharding.shard_shape(worker.k_pages.shape)
    kv_replicated = kv_shard == worker.k_pages.shape
    print(f"sharded in {shard_s:.0f}s: backbone/device "
          f"{bb_dev / 2**30:.2f} GiB, all-params/device "
          f"{all_dev / 2**30:.2f} GiB, kv replicated={kv_replicated}",
          flush=True)
    # Megatron split: per-device backbone must be ~1/TP of total (norms
    # replicate, hence the 2% slack) — same assertion as the budget test,
    # now on materialized arrays
    bb_total = sum(a.nbytes for a in jax.tree.leaves(model.params["backbone"]))
    assert bb_dev < bb_total / TP * 1.02, (bb_dev, bb_total)
    assert kv_replicated, "KH=2 @ tp=4 must replicate the pool"

    req = Request(request_id="glm9b", prompt="full scale sharding dryrun")
    t0 = time.monotonic()
    worker.run_lm_prefill([req])
    worker.sync()
    prefill_s = time.monotonic() - t0
    print(f"prefill done in {prefill_s:.0f}s (compile + run)", flush=True)
    t0 = time.monotonic()
    for _ in range(DECODE_STEPS):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    worker.sync()
    decode_s = time.monotonic() - t0
    tokens = [int(t[0]) for t in req.lm_output_tokens]
    print(f"{len(tokens)} greedy tokens in {decode_s:.0f}s: {tokens}",
          flush=True)
    assert len(tokens) >= 2, "decode produced too few tokens"
    assert all(0 <= t < bb.vocab_size for t in tokens)
    worker.free_kv_cache(req)

    out = {
        "config": "GLM-4-Voice-9B full dims (L40 H4096 inter13696 "
                  "vocab168960 KH2)",
        "tp": TP,
        "mesh": "4-device virtual CPU mesh (xla_force_host_platform)",
        "params_gib_total": round(total_bytes / 2**30, 2),
        "backbone_gib_per_device": round(bb_dev / 2**30, 3),
        "all_params_gib_per_device": round(all_dev / 2**30, 3),
        "kv_pool_replicated": bool(kv_replicated),
        "greedy_tokens": tokens,
        "timings_s": {"init": round(init_s, 1), "shard": round(shard_s, 1),
                      "prefill": round(prefill_s, 1),
                      "decode": round(decode_s, 1)},
        "ok": True,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "glm9b_full_dryrun_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
