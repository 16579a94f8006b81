"""Tensor parallelism: worker with tp_size=4 over the virtual CPU mesh must
produce the same greedy tokens as tp_size=1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.glm_voice import GLMVoiceLM
from vox_serve_tpu.codecs.glm_flow import GLMFlowConfig
from vox_serve_tpu.codecs.hifigan import HiFTConfig
from vox_serve_tpu.requests import Request
from vox_serve_tpu.sampling import SamplingConfig
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

SMALL = BackboneConfig(
    vocab_size=168960, hidden_size=64, num_layers=2, num_heads=8,
    num_kv_heads=4, head_dim=16, intermediate_size=128, qkv_bias=True,
    rope_dim=8, dtype=jnp.float32,
)
FLOW = GLMFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    vocab_size=16384, spk_dim=8, mel_dim=16, est_channels=(16, 16),
    est_head_dim=8, est_heads=2, est_n_blocks=1, est_mid_blocks=1,
    n_timesteps=2, regulator_layers=1)
HIFT = HiFTConfig(in_channels=16, base_channels=32, nb_harmonics=2,
                  upsample_rates=(8, 5, 3), upsample_kernel_sizes=(16, 11, 7),
                  f0_cond_channels=16)


def _greedy_tokens(tp_size, steps=6):
    model = GLMVoiceLM(dtype=jnp.float32, debug_backbone=SMALL,
                       debug_flow=FLOW, debug_hift=HIFT)
    # max_tokens is an ABSOLUTE position cap (prompt included)
    model.sampling_config = SamplingConfig(greedy=True, max_tokens=512)
    wcfg = WorkerConfig(max_batch_size=2, num_pages=128, page_size=16,
                        prefill_token_buckets=(512,), max_prefill_requests=2,
                        warmup=False, tp_size=tp_size)
    worker = ModelWorker(model, wcfg)
    req = Request(request_id="tp", prompt="hello")
    worker.run_lm_prefill([req])
    for _ in range(steps):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    worker.free_kv_cache(req)
    return [int(t[0]) for t in req.lm_output_tokens]


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_tp4_matches_tp1_greedy():
    t1 = _greedy_tokens(1)
    t4 = _greedy_tokens(4)
    assert len(t1) == len(t4) >= 3
    assert t1 == t4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_tp_kv_pool_is_sharded():
    """The combined token-major pool (L, P, page, 2KH, D) must shard its
    combined-head axis (axis 3) across tp — a replicated pool would silently
    forfeit the whole point of TP for KV memory scaling."""
    tp = 4
    model = GLMVoiceLM(dtype=jnp.float32, debug_backbone=SMALL,
                       debug_flow=FLOW, debug_hift=HIFT)
    wcfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=16,
                        prefill_token_buckets=(512,), warmup=False,
                        tp_size=tp)
    worker = ModelWorker(model, wcfg)
    assert worker.kv_config.combined, "GLM dev config should use combined"
    assert worker.v_pages is None
    pool = worker.k_pages
    shard = pool.sharding.shard_shape(pool.shape)
    # combined K/V head axis split tp ways; K(even)/V(odd) of one head stay
    # adjacent, so per-shard width must be an even number of combined heads
    assert shard[3] == 2 * SMALL.num_kv_heads // tp
    assert shard[3] % 2 == 0
    # all other axes replicated
    assert shard[:3] == pool.shape[:3] and shard[4] == pool.shape[4]
    # memory actually scales: per-device bytes == total/tp
    per_dev = {d: s.data.nbytes for s, d in
               zip(pool.addressable_shards,
                   [s.device for s in pool.addressable_shards])}
    total = pool.dtype.itemsize * int(np.prod(pool.shape))
    assert sum(per_dev.values()) == total
    assert all(b == total // tp for b in per_dev.values())


def test_layer_norm_model_shardings_match_param_structure():
    """use_layer_norm models (Zonos) add *_b bias keys; the sharding pytree
    must mirror them or device_put's tree.map raises at startup."""
    import jax
    import jax.numpy as jnp

    from vox_serve_tpu.models.backbone import (BackboneConfig,
                                               init_backbone_params)
    from vox_serve_tpu.parallel.mesh import make_mesh
    from vox_serve_tpu.parallel.sharding import backbone_param_shardings

    cfg = BackboneConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, use_layer_norm=True,
        dtype=jnp.float32)
    params = init_backbone_params(cfg, jax.random.key(0))
    mesh = make_mesh(dp=1, tp=len(jax.devices()))
    sh = backbone_param_shardings(mesh, params)
    # tree.map with both trees raises on structure mismatch — exactly the
    # failure mode shard_params would hit at startup
    jax.tree.map(lambda a, s: None, params, sh)


def test_make_mesh_validation():
    import jax
    import pytest

    from vox_serve_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(dp=n * 2)  # more replicas than devices
