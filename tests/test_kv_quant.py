"""KV-pool quantization (int8 / f8_e4m3): op-level decode parity vs the
full-precision combined pool, worker plumbing (pool dtype, unsupported-shape
fallback), and CLI flag plumbing.

Reference cost center being attacked: FlashInfer's paged decode reads
(/root/reference/vox_serve/flashinfer_utils.py:149-247) — here the ragged
kernel dequantizes in-kernel, so the pool stores (and attention DMAs) one
byte per element instead of two.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.ops.attention import (
    AttnMetadata,
    paged_attention_decode,
    write_kv_decode,
)
from vox_serve_tpu.ops.kv_cache import (
    KVCacheConfig,
    alloc_kv_pages,
    combined_kv_supported,
)


def _rand(key, shape):
    import jax
    return jax.random.normal(jax.random.key(key), shape, dtype=jnp.float32)


def _build_pool(quant, L=2, P=8, page=4, KH=2, D=64, k_amax=6.0, v_amax=6.0):
    cfg = KVCacheConfig(num_layers=L, num_pages=P, page_size=page,
                        num_kv_heads=KH, head_dim=D, dtype=jnp.float32,
                        combined=True, quant=quant,
                        k_amax=k_amax, v_amax=v_amax)
    pool, none = alloc_kv_pages(cfg)
    assert none is None
    return cfg, pool


@pytest.mark.parametrize("quant,tol", [("int8", 0.06), ("f8_e4m3", 0.12)])
def test_quantized_pool_decode_parity(quant, tol):
    """Quantized combined pool must reproduce full-precision decode attention
    within the per-element quantization error budget (int8 with a 6.0 amax
    over ~N(0,1) data keeps |err| well under 6%)."""
    L, P, page, KH, H, D = 2, 8, 4, 2, 4, 64
    B = 3
    cfg_fp, pool_fp = _build_pool("none", L, P, page, KH, D)
    cfg_q, pool_q = _build_pool(quant, L, P, page, KH, D)
    assert pool_q.dtype == cfg_q.pool_dtype
    assert pool_q.nbytes * 4 == pool_fp.nbytes  # f32 ref pool vs 1-byte

    tables = np.zeros((B, 3), np.int32)
    tables[0, :2] = [1, 2]
    tables[1, :1] = [3]
    tables[2, :3] = [4, 5, 6]
    lens = np.array([6, 3, 9], np.int32)
    for layer in range(L):
        for b in range(B):
            for t in range(lens[b]):
                meta = AttnMetadata(
                    False, jnp.array([tables[b, t // page]], jnp.int32),
                    jnp.array([t % page], jnp.int32))
                k = _rand(1000 + layer * 100 + b * 10 + t, (1, KH, D))
                v = _rand(2000 + layer * 100 + b * 10 + t, (1, KH, D))
                pool_fp, _ = write_kv_decode(pool_fp, None, layer, k, v, meta)
                pool_q, _ = write_kv_decode(pool_q, None, layer, k, v, meta,
                                            kv_scales=cfg_q.kv_scales)

    meta = AttnMetadata(
        False, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        block_tables=jnp.asarray(tables), seq_lens=jnp.asarray(lens))
    for layer in range(L):
        q = _rand(7 + layer, (B, H, D))
        ref = np.asarray(paged_attention_decode(q, pool_fp, None, layer,
                                                meta))
        out = np.asarray(paged_attention_decode(
            q, pool_q, None, layer, meta, kv_scales=cfg_q.kv_scales))
        np.testing.assert_allclose(out, ref, atol=tol, rtol=0)
        # and it must actually be close-but-not-equal (quantization is real)
        assert np.abs(out - ref).max() > 0


def test_int8_write_respects_amax_clipping():
    """Values beyond amax clip to +-127 rather than wrapping."""
    cfg, pool = _build_pool("int8", k_amax=1.0, v_amax=1.0)
    meta = AttnMetadata(False, jnp.array([1], jnp.int32),
                        jnp.array([0], jnp.int32))
    k = jnp.full((1, cfg.num_kv_heads, cfg.head_dim), 50.0, jnp.float32)
    v = -k
    pool, _ = write_kv_decode(pool, None, 0, k, v, meta,
                              kv_scales=cfg.kv_scales)
    row = np.asarray(pool[0, 1, 0])  # (2KH, Ds)
    assert row[0::2, :cfg.head_dim].max() == 127
    assert row[1::2, :cfg.head_dim].min() == -127


def test_combined_kv_supported_packing():
    """int8 packs 4 elems/lane-word: the combined 2KH axis must divide the
    packing (odd KH -> 2KH=2 not divisible by 4 -> unsupported)."""
    assert combined_kv_supported(64, 2, jnp.int8)
    assert not combined_kv_supported(64, 1, jnp.int8)  # 2KH=2, packing 4
    assert combined_kv_supported(64, 1, jnp.bfloat16)  # 2KH=2, packing 2
    assert not combined_kv_supported(256, 4, jnp.int8)  # head_dim > 128


def test_worker_kv_quant_pool_dtype_and_decode():
    """Worker with kv_quant=int8: pool allocates at int8, scales thread to
    the model, and an end-to-end prefill+decode still produces tokens."""
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.requests import Request
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    model = DummyLM()
    wcfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=16,
                        warmup=False, kv_quant="int8",
                        kv_k_amax=8.0, kv_v_amax=8.0)
    worker = ModelWorker(model, wcfg)
    assert worker.kv_config.quant == "int8"
    assert worker.k_pages.dtype == jnp.int8
    assert model.kv_quant_scales == (8.0 / 127.0, 8.0 / 127.0)
    req = Request(request_id="q", prompt="hello world")
    worker.run_lm_prefill([req])
    for _ in range(4):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    worker.free_kv_cache(req)
    assert len(req.lm_output_tokens) >= 2


def test_worker_kv_quant_unsupported_shape_falls_back():
    """int8 needs 2KH % 4 == 0; a KH=1 model must downgrade to a
    full-precision pool instead of allocating an untileable one."""
    import jax

    from vox_serve_tpu.models.backbone import BackboneConfig
    from vox_serve_tpu.models.dummy import DummyLM
    from vox_serve_tpu.worker import ModelWorker, WorkerConfig

    model = DummyLM()
    model._cfg = BackboneConfig(
        vocab_size=model.backbone_config.vocab_size, hidden_size=64,
        num_layers=2, num_heads=4, num_kv_heads=1, intermediate_size=128,
        dtype=jnp.float32)
    from vox_serve_tpu.models.backbone import init_backbone_params
    model.params = {"backbone": init_backbone_params(model._cfg,
                                                     jax.random.key(0)),
                    **{k: v for k, v in model.params.items()
                       if k != "backbone"}}
    wcfg = WorkerConfig(max_batch_size=2, num_pages=64, page_size=16,
                        warmup=False, kv_quant="int8")
    worker = ModelWorker(model, wcfg)
    assert worker.kv_config.quant == "none"
    assert worker.k_pages.dtype == model.backbone_config.dtype


def test_cli_plumbing_launch_to_daemon():
    """--kv-quant/--kv-k-amax/--kv-v-amax must survive launch.py ->
    scheduler_args -> scheduler_entry parser -> WorkerConfig kwargs
    (they were parsed-but-dropped before round 5)."""
    from vox_serve_tpu.scheduler_entry import build_parser as daemon_parser

    args = daemon_parser().parse_args(
        ["--model", "dummy", "--kv-quant", "int8",
         "--kv-k-amax", "12.5", "--kv-v-amax", "9.0"])
    assert args.kv_quant == "int8"
    assert args.kv_k_amax == 12.5 and args.kv_v_amax == 9.0

    import inspect

    from vox_serve_tpu import launch
    src = inspect.getsource(launch.main)
    for key in ("kv_quant", "kv_k_amax", "kv_v_amax"):
        assert f'"{key}"' in src, f"{key} missing from scheduler_args"
