"""int8 weight-only quantization (backbone matmuls): numeric parity within
the per-channel quantization budget, worker integration, TP sharding
structure. VERDICT r4 next-step #8 — the weight-streaming-bound families'
(Orpheus-3B, GLM-9B-on-one-chip) path to their roofline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.models.backbone import (
    BackboneConfig,
    init_backbone_params,
    linear,
    quantize_backbone_params,
    quantize_linear_params,
)

CFG = BackboneConfig(
    vocab_size=64, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=128, dtype=jnp.float32)


def test_quantized_linear_parity():
    key = jax.random.key(0)
    w = jax.random.normal(key, (32, 48)) * 0.3
    p = {"w": w, "b": jnp.ones((48,)) * 0.1}
    q = quantize_linear_params(p)
    assert q["w_q"].dtype == jnp.int8
    assert q["w_s"].shape == (48,)
    x = jax.random.normal(jax.random.key(1), (5, 32))
    ref = np.asarray(linear(p, x))
    out = np.asarray(linear(q, x))
    # per-element |err| <= d_in * max|x| * scale/2; empirically ~1e-2 here
    assert np.abs(out - ref).max() < 0.05
    assert np.abs(out - ref).max() > 0  # actually quantized


def test_quantized_backbone_forward_close():
    """Full quantized backbone forward vs full-precision on one prefill."""
    from vox_serve_tpu.ops.attention import AttnMetadata
    from vox_serve_tpu.ops.kv_cache import KVCacheConfig, alloc_kv_pages
    from vox_serve_tpu.models.backbone import backbone_forward

    params = init_backbone_params(CFG, jax.random.key(0))
    qparams = quantize_backbone_params(params)
    # stacked layer weights quantize per (layer, out_channel)
    assert qparams["layers"]["mlp"]["gate"]["w_q"].shape == (
        2, 64, 128)
    assert qparams["layers"]["mlp"]["gate"]["w_s"].shape == (2, 128)

    kvcfg = KVCacheConfig(num_layers=2, num_pages=8, page_size=16,
                          num_kv_heads=2, head_dim=CFG.resolved_head_dim,
                          dtype=jnp.float32)
    T = 8
    x = jax.random.normal(jax.random.key(2), (T, 64)) * 0.5
    pos = jnp.arange(T, dtype=jnp.int32)
    meta = AttnMetadata(
        True, jnp.full((T,), 1, jnp.int32), jnp.arange(T, dtype=jnp.int32),
        segment_ids=jnp.zeros((T,), jnp.int32), q_positions=pos,
        seq_lens=jnp.array([T], jnp.int32))
    kp, vp = alloc_kv_pages(kvcfg)
    ref, _, _ = backbone_forward(params, CFG, x, pos, meta, kp, vp)
    kp2, vp2 = alloc_kv_pages(kvcfg)
    out, _, _ = backbone_forward(qparams, CFG, x, pos, meta, kp2, vp2)
    ref, out = np.asarray(ref), np.asarray(out)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() / denom < 0.05


def test_worker_weight_quant_decodes_and_halves_bytes():
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.requests import Request
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    def bb_bytes(model):
        return sum(a.nbytes for a in jax.tree.leaves(
            model.params["backbone"]))

    base = bb_bytes(DummyLM())
    model = DummyLM()
    wcfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=16,
                        warmup=False, weight_quant="int8")
    worker = ModelWorker(model, wcfg)
    # f32 dev model: int8 weights + f32 scales ~ 1/4 the matmul bytes;
    # norms stay f32. Anything < 40% proves the transform really applied.
    assert bb_bytes(model) < 0.4 * base
    req = Request(request_id="wq", prompt="hello world")
    worker.run_lm_prefill([req])
    for _ in range(4):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    worker.free_kv_cache(req)
    assert len(req.lm_output_tokens) >= 2


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_weight_quant_tp_sharding_structure():
    """Quantized leaves (w_q/w_s) must have matching sharding-tree
    structure or device_put raises at worker startup."""
    from vox_serve_tpu.parallel.mesh import make_mesh
    from vox_serve_tpu.parallel.sharding import backbone_param_shardings

    params = quantize_backbone_params(
        init_backbone_params(CFG, jax.random.key(0)))
    mesh = make_mesh(dp=1, tp=4)
    sh = backbone_param_shardings(mesh, params)
    jax.tree.map(lambda a, s: None, params, sh)
    # col-parallel scales shard over tp; row-parallel scales replicate
    gate_s = sh["layers"]["mlp"]["gate"]["w_s"]
    down_s = sh["layers"]["mlp"]["down"]["w_s"]
    assert gate_s.shard_shape((2, 128))[1] == 32
    assert down_s.shard_shape((2, 64))[1] == 64
