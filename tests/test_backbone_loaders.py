"""Checkpoint-mapping tests for the round-2 backbone loaders (GLM-4-Voice,
Zonos, Step-Audio-2, Chatterbox): synthetic state dicts in the exact
reference layouts, with numeric checks on the fused-tensor splits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vox_serve_tpu.models.backbone import BackboneConfig, backbone_forward
from vox_serve_tpu.ops.attention import AttnMetadata
from vox_serve_tpu.ops.kv_cache import KVCacheConfig, alloc_kv_pages
from vox_serve_tpu.weights import (load_glm_backbone,
                                   load_llama_family_backbone,
                                   load_zonos_backbone)

rng = np.random.default_rng(0)


def _r(*shape):
    return rng.normal(size=shape).astype(np.float32) * 0.05


def _glm_state(L, H, heads, kvh, hd, ffn):
    qd, kd = heads * hd, kvh * hd
    s = {}
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        s[p + "self_attention.query_key_value.weight"] = _r(qd + 2 * kd, H)
        s[p + "self_attention.query_key_value.bias"] = _r(qd + 2 * kd)
        s[p + "self_attention.dense.weight"] = _r(H, qd)
        s[p + "mlp.dense_h_to_4h.weight"] = _r(2 * ffn, H)
        s[p + "mlp.dense_4h_to_h.weight"] = _r(H, ffn)
        s[p + "input_layernorm.weight"] = _r(H)
        s[p + "post_attention_layernorm.weight"] = _r(H)
    s["transformer.encoder.final_layernorm.weight"] = _r(H)
    s["transformer.embedding.word_embeddings.weight"] = _r(50, H)
    s["transformer.output_layer.weight"] = _r(50, H)
    return s


def test_glm_fused_qkv_and_mlp_split():
    L, H, heads, kvh, hd, ffn = 2, 16, 4, 2, 4, 24
    s = _glm_state(L, H, heads, kvh, hd, ffn)
    bb = load_glm_backbone(s, L, heads, kvh, hd, dtype=jnp.float32)
    qkv = s["transformer.encoder.layers.0.self_attention.query_key_value.weight"]
    qd, kd = heads * hd, kvh * hd
    x = _r(3, H)
    np.testing.assert_allclose(
        x @ np.asarray(bb["layers"]["attn"]["q"]["w"][0]),
        x @ qkv[:qd].T, rtol=1e-5)
    np.testing.assert_allclose(
        x @ np.asarray(bb["layers"]["attn"]["v"]["w"][0]),
        x @ qkv[qd + kd:].T, rtol=1e-5)
    h4h = s["transformer.encoder.layers.0.mlp.dense_h_to_4h.weight"]
    # swiglu order: chunk[0] = gate, chunk[1] = up (reference glm_voice.py:95)
    np.testing.assert_allclose(
        x @ np.asarray(bb["layers"]["mlp"]["gate"]["w"][0]),
        x @ h4h[:ffn].T, rtol=1e-5)
    np.testing.assert_allclose(
        x @ np.asarray(bb["layers"]["mlp"]["up"]["w"][0]),
        x @ h4h[ffn:].T, rtol=1e-5)


def test_glm_loaded_backbone_runs_forward():
    L, H, heads, kvh, hd, ffn = 2, 16, 4, 2, 4, 24
    s = _glm_state(L, H, heads, kvh, hd, ffn)
    bb = load_glm_backbone(s, L, heads, kvh, hd, dtype=jnp.float32)
    cfg = BackboneConfig(vocab_size=50, hidden_size=H, num_layers=L,
                         num_heads=heads, num_kv_heads=kvh, head_dim=hd,
                         intermediate_size=ffn, qkv_bias=True, rope_dim=2,
                         dtype=jnp.float32)
    kv_cfg = KVCacheConfig(num_layers=L, num_pages=4, page_size=4,
                           num_kv_heads=kvh, head_dim=hd, dtype=jnp.float32)
    k_pages, v_pages = alloc_kv_pages(kv_cfg)
    T = 4
    meta = AttnMetadata(True, jnp.ones((T,), jnp.int32),
                        jnp.arange(T, dtype=jnp.int32) % 4,
                        segment_ids=jnp.zeros((T,), jnp.int32),
                        q_positions=jnp.arange(T, dtype=jnp.int32))
    x = jnp.asarray(_r(T, H))
    h, _, _ = backbone_forward(bb, cfg, x, jnp.arange(T, dtype=jnp.int32),
                               meta, k_pages, v_pages)
    assert h.shape == (T, H) and bool(jnp.all(jnp.isfinite(h)))


def test_zonos_fused_in_proj_and_glu_order():
    L, H, heads, hd, ffn = 2, 16, 4, 4, 24
    qd = heads * hd
    s = {}
    for i in range(L):
        p = f"backbone.layers.{i}."
        s[p + "mixer.in_proj.weight"] = _r(3 * qd, H)
        s[p + "mixer.out_proj.weight"] = _r(H, qd)
        s[p + "mlp.fc1.weight"] = _r(2 * ffn, H)
        s[p + "mlp.fc2.weight"] = _r(H, ffn)
        s[p + "norm.weight"] = _r(H)
        s[p + "norm.bias"] = _r(H)
        s[p + "norm2.weight"] = _r(H)
        s[p + "norm2.bias"] = _r(H)
    s["backbone.norm_f.weight"] = _r(H)
    s["backbone.norm_f.bias"] = _r(H)
    bb = load_zonos_backbone(s, L, heads, heads, hd, dtype=jnp.float32)
    x = _r(3, H)
    in_proj = s["backbone.layers.0.mixer.in_proj.weight"]
    np.testing.assert_allclose(
        x @ np.asarray(bb["layers"]["attn"]["k"]["w"][0]),
        x @ in_proj[qd:2 * qd].T, rtol=1e-5)
    fc1 = s["backbone.layers.0.mlp.fc1.weight"]
    # zonos GLU: chunk[0] = up (y), chunk[1] = silu gate (zonos.py:70-74)
    np.testing.assert_allclose(
        x @ np.asarray(bb["layers"]["mlp"]["up"]["w"][0]),
        x @ fc1[:ffn].T, rtol=1e-5)
    np.testing.assert_allclose(
        x @ np.asarray(bb["layers"]["mlp"]["gate"]["w"][0]),
        x @ fc1[ffn:].T, rtol=1e-5)
    assert "input_norm_b" in bb["layers"] and "final_norm_b" in bb


@pytest.mark.parametrize("prefix,qkv_bias", [("model.", True), ("tfmr.", False)])
def test_llama_family_prefixes(prefix, qkv_bias):
    """Step-Audio-2 (model., qkv bias) and Chatterbox (tfmr.) reuse the
    llama-family loader with different prefixes."""
    L, H, heads, kvh, hd, ffn = 2, 16, 4, 2, 4, 24
    s = {}
    for i in range(L):
        p = f"{prefix}layers.{i}."
        for n, shape in [("self_attn.q_proj", (heads * hd, H)),
                         ("self_attn.k_proj", (kvh * hd, H)),
                         ("self_attn.v_proj", (kvh * hd, H)),
                         ("self_attn.o_proj", (H, heads * hd)),
                         ("mlp.gate_proj", (ffn, H)),
                         ("mlp.up_proj", (ffn, H)),
                         ("mlp.down_proj", (H, ffn))]:
            s[p + n + ".weight"] = _r(*shape)
            if qkv_bias and n.startswith("self_attn") and n != "self_attn.o_proj":
                s[p + n + ".bias"] = _r(shape[0])
        s[p + "input_layernorm.weight"] = _r(H)
        s[p + "post_attention_layernorm.weight"] = _r(H)
    s[f"{prefix}norm.weight"] = _r(H)
    bb = load_llama_family_backbone(s, L, prefix=prefix, qkv_bias=qkv_bias,
                                    dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(bb["layers"]["attn"]["o"]["w"][1]),
        s[f"{prefix}layers.1.self_attn.o_proj.weight"].T, rtol=1e-6)
    assert ("b" in bb["layers"]["attn"]["q"]) == qkv_bias
