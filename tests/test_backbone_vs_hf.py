"""Numerical parity: our backbone vs transformers' LlamaModel / Qwen2Model
with identical (random) weights — validates RoPE, GQA, norms, and the paged
prefill path end to end against a trusted implementation."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vox_serve_tpu.models.backbone import BackboneConfig, backbone_forward
from vox_serve_tpu.ops.attention import AttnMetadata
from vox_serve_tpu.ops.kv_cache import KVCacheConfig, alloc_kv_pages
from vox_serve_tpu.weights import load_llama_family_backbone


def _hf_llama(vocab=128, hidden=64, layers=2, heads=4, kv_heads=2, inter=128,
              qkv_bias=False, model_type="llama"):
    if model_type == "llama":
        from transformers import LlamaConfig, LlamaModel

        cfg = LlamaConfig(
            vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=kv_heads,
            intermediate_size=inter, rope_theta=10000.0,
            attention_bias=qkv_bias, max_position_embeddings=256,
        )
        return LlamaModel(cfg)
    from transformers import Qwen2Config, Qwen2Model

    cfg = Qwen2Config(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        intermediate_size=inter, rope_theta=10000.0,
        max_position_embeddings=256,
    )
    return Qwen2Model(cfg)


@pytest.mark.parametrize("model_type,qkv_bias", [("llama", False),
                                                 ("qwen2", True)])
def test_prefill_matches_transformers(model_type, qkv_bias):
    torch.manual_seed(0)
    hf = _hf_llama(qkv_bias=qkv_bias, model_type=model_type).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    # our loader expects the "model." prefix of full checkpoints
    state = {f"model.{k}": v for k, v in state.items()}

    cfg = BackboneConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, rope_theta=10000.0,
        qkv_bias=qkv_bias, dtype=jnp.float32,
    )
    params = load_llama_family_backbone(state, 2, qkv_bias=qkv_bias,
                                        dtype=jnp.float32)

    T = 12
    ids = np.random.RandomState(1).randint(0, 128, size=(1, T))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state[0].numpy()

    kvc = KVCacheConfig(num_layers=2, num_pages=8, page_size=4,
                        num_kv_heads=2, head_dim=16, dtype=jnp.float32)
    k_pages, v_pages = alloc_kv_pages(kvc)
    embed = jnp.asarray(state["model.embed_tokens.weight"], jnp.float32)
    x = jnp.take(embed, jnp.asarray(ids[0]), axis=0)
    meta = AttnMetadata(
        True,
        jnp.asarray([1 + t // 4 for t in range(T)], jnp.int32),
        jnp.asarray([t % 4 for t in range(T)], jnp.int32),
        segment_ids=jnp.zeros((T,), jnp.int32),
        q_positions=jnp.arange(T, dtype=jnp.int32),
    )
    out, _, _ = backbone_forward(params, cfg, x,
                                 jnp.arange(T, dtype=jnp.int32), meta,
                                 k_pages, v_pages)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_decode_matches_transformers_incremental():
    """Prefill 8 tokens then decode 3 more through the paged path; compare
    each new hidden state against the HF full forward."""
    torch.manual_seed(3)
    hf = _hf_llama().eval()
    state = {f"model.{k}": v.detach().numpy()
             for k, v in hf.state_dict().items()}
    cfg = BackboneConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, rope_theta=10000.0,
        dtype=jnp.float32,
    )
    params = load_llama_family_backbone(state, 2, dtype=jnp.float32)
    embed = jnp.asarray(state["model.embed_tokens.weight"], jnp.float32)

    ids = np.random.RandomState(2).randint(0, 128, size=(11,))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids[None])).last_hidden_state[0].numpy()

    kvc = KVCacheConfig(num_layers=2, num_pages=8, page_size=4,
                        num_kv_heads=2, head_dim=16, dtype=jnp.float32)
    k_pages, v_pages = alloc_kv_pages(kvc)
    # prefill first 8
    T = 8
    meta = AttnMetadata(
        True,
        jnp.asarray([1 + t // 4 for t in range(T)], jnp.int32),
        jnp.asarray([t % 4 for t in range(T)], jnp.int32),
        segment_ids=jnp.zeros((T,), jnp.int32),
        q_positions=jnp.arange(T, dtype=jnp.int32),
    )
    x = jnp.take(embed, jnp.asarray(ids[:8]), axis=0)
    _, k_pages, v_pages = backbone_forward(
        params, cfg, x, jnp.arange(T, dtype=jnp.int32), meta, k_pages, v_pages)
    # decode tokens 8..10 one at a time
    for t in range(8, 11):
        page = 1 + t // 4
        meta_d = AttnMetadata(
            False,
            jnp.asarray([page], jnp.int32),
            jnp.asarray([t % 4], jnp.int32),
            block_tables=jnp.asarray([[1, 2, 3, 0]], jnp.int32),
            seq_lens=jnp.asarray([t + 1], jnp.int32),
        )
        x = jnp.take(embed, jnp.asarray(ids[t:t + 1]), axis=0)
        out, k_pages, v_pages = backbone_forward(
            params, cfg, x, jnp.asarray([t], jnp.int32), meta_d,
            k_pages, v_pages)
        np.testing.assert_allclose(np.asarray(out[0]), ref[t],
                                   rtol=2e-3, atol=2e-3)
