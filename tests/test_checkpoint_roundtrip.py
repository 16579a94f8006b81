"""On-disk checkpoint loading round-trip (SURVEY §5.4).

The per-family weight mappings are unit-tested on in-memory dicts
(test_backbone_loaders.py); this module closes the remaining gap up to the
real-asset boundary: a synthetic checkpoint in the EXACT HF layout is
written to disk as sharded safetensors, resolved through
``resolve_model_dir`` (local-dir branch), loaded through
``load_safetensors_state`` (parallel shard merge), and mapped by the
family's ``_load_checkpoint`` — then every mapped tensor is compared
numerically against the source state. With real checkpoints unavailable in
this environment (zero egress; see artifacts/golden_readiness_r4.md), this
is the strongest possible loader evidence: only the tensor VALUES differ
from production.

Reference load sites: CSM via transformers from_pretrained
(/root/reference/vox_serve/model/csm.py:329), Qwen3 manual shard merge
(/root/reference/vox_serve/model/qwen3_tts.py:987-1034).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vox_serve_tpu.codecs.mimi import MimiConfig
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.depth import DepthConfig

rng = np.random.default_rng(42)


def _r(*shape):
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


def _llama_state(prefix, L, H, heads, kvh, hd, ffn, qk_norm=False):
    """HF Llama/Qwen layout under ``prefix`` (what
    load_llama_family_backbone consumes)."""
    s = {}
    for i in range(L):
        p = f"{prefix}layers.{i}."
        s[p + "self_attn.q_proj.weight"] = _r(heads * hd, H)
        s[p + "self_attn.k_proj.weight"] = _r(kvh * hd, H)
        s[p + "self_attn.v_proj.weight"] = _r(kvh * hd, H)
        s[p + "self_attn.o_proj.weight"] = _r(H, heads * hd)
        s[p + "mlp.gate_proj.weight"] = _r(ffn, H)
        s[p + "mlp.up_proj.weight"] = _r(ffn, H)
        s[p + "mlp.down_proj.weight"] = _r(H, ffn)
        s[p + "input_layernorm.weight"] = _r(H)
        s[p + "post_attention_layernorm.weight"] = _r(H)
        if qk_norm:
            s[p + "self_attn.q_norm.weight"] = _r(hd)
            s[p + "self_attn.k_norm.weight"] = _r(hd)
    s[prefix + "norm.weight"] = _r(H)
    return s


def _write_sharded(tmp_path, state):
    """Write the state as TWO safetensors shards (exercises the parallel
    shard merge in load_safetensors_state)."""
    from safetensors.numpy import save_file

    keys = sorted(state)
    mid = len(keys) // 2
    save_file({k: state[k] for k in keys[:mid]},
              str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file({k: state[k] for k in keys[mid:]},
              str(tmp_path / "model-00002-of-00002.safetensors"))
    return str(tmp_path)


def _assert_backbone_mapped(bb, state, prefix, L, qk_norm=False):
    for i in range(L):
        p = f"{prefix}layers.{i}."
        np.testing.assert_array_equal(
            np.asarray(bb["layers"]["attn"]["q"]["w"][i]),
            state[p + "self_attn.q_proj.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(bb["layers"]["mlp"]["down"]["w"][i]),
            state[p + "mlp.down_proj.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(bb["layers"]["input_norm"][i]),
            state[p + "input_layernorm.weight"])
        if qk_norm:
            np.testing.assert_array_equal(
                np.asarray(bb["layers"]["attn"]["q_norm"][i]),
                state[p + "self_attn.q_norm.weight"])
    np.testing.assert_array_equal(
        np.asarray(bb["final_norm"]), state[prefix + "norm.weight"])


def test_csm_checkpoint_loads_from_disk(tmp_path):
    """CSM end-to-end: construction with model_name=<dir> takes the
    checkpoint branch of _init_params (not random init)."""
    from vox_serve_tpu.models.csm import CSMLM

    L, H, heads, kvh, hd, ffn = 2, 64, 4, 2, 16, 128
    dL, dH, dffn = 2, 32, 64
    state = _llama_state("backbone_model.", L, H, heads, kvh, hd, ffn)
    state.update(_llama_state("depth_decoder.model.", dL, dH, 4, 2, 8, dffn))
    state["backbone_model.embed_tokens.embed_audio_tokens.weight"] = _r(96, H)
    state["embed_text_tokens.weight"] = _r(80, H)
    state["lm_head.weight"] = _r(50, H)
    state["depth_decoder.model.inputs_embeds_projector.weight"] = _r(dH, H)
    state["depth_decoder.model.embed_tokens.weight"] = _r(96, H)
    state["depth_decoder.codebooks_head.weight"] = _r(31, dH, 50)
    model_dir = _write_sharded(tmp_path, state)

    model = CSMLM(
        model_name=model_dir, dtype=jnp.float32,
        debug_backbone=BackboneConfig(
            vocab_size=50, hidden_size=H, num_layers=L, num_heads=heads,
            num_kv_heads=kvh, head_dim=hd, intermediate_size=ffn,
            rope_theta=5e5, llama31_rope_scaling=True, dtype=jnp.float32),
        debug_depth=DepthConfig(
            hidden_size=dH, num_layers=dL, num_heads=4, num_kv_heads=2,
            head_dim=8, intermediate_size=dffn, max_seq=33,
            dtype=jnp.float32),
        debug_codec=MimiConfig(
            n_codebooks=32, codebook_size=2048, vq_dim=8, num_filters=8,
            upsample_ratios=(4, 3), hidden_size=16, intermediate_size=32,
            head_dim=8, num_heads=2, num_kv_heads=2, num_layers=2,
            sliding_window=6))

    _assert_backbone_mapped(model.params["backbone"], state,
                            "backbone_model.", L)
    _assert_backbone_mapped(model.params["depth"]["backbone"], state,
                            "depth_decoder.model.", dL)
    np.testing.assert_array_equal(
        np.asarray(model.params["audio_embed"]),
        state["backbone_model.embed_tokens.embed_audio_tokens.weight"])
    np.testing.assert_array_equal(np.asarray(model.params["text_embed"]),
                                  state["embed_text_tokens.weight"])
    np.testing.assert_array_equal(np.asarray(model.params["lm_head"]),
                                  state["lm_head.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(model.params["depth"]["proj"]["w"]),
        state["depth_decoder.model.inputs_embeds_projector.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(model.params["depth"]["heads"]),
        state["depth_decoder.codebooks_head.weight"])
    # no codec_model.* keys -> Mimi codec fell back to random init and says so
    assert model.codec_assets_available is False


def test_qwen3_checkpoint_mapping_from_disk(tmp_path):
    """Qwen3-TTS _load_checkpoint against an on-disk synthetic checkpoint
    (called directly: _init_params intentionally skips checkpoint resolution
    under debug configs)."""
    from vox_serve_tpu.models.qwen3_tts import Qwen3TTSLM

    L, H, heads, kvh, hd, ffn = 2, 64, 4, 2, 16, 128
    dL, dH = 2, 32
    n_cp = 15  # num_code_groups(16) - 1
    t, cp = "talker.model.", "talker.code_predictor."
    state = _llama_state(t, L, H, heads, kvh, hd, ffn, qk_norm=True)
    state.update(_llama_state(cp + "model.", dL, dH, 4, 2, 8, 64,
                              qk_norm=True))
    state[t + "codec_embedding.weight"] = _r(70, H)
    state[t + "text_embedding.weight"] = _r(90, H)
    state["talker.text_projection.linear_fc1.weight"] = _r(H, H)
    state["talker.text_projection.linear_fc1.bias"] = _r(H)
    state["talker.text_projection.linear_fc2.weight"] = _r(H, H)
    state["talker.text_projection.linear_fc2.bias"] = _r(H)
    state["talker.codec_head.weight"] = _r(70, H)
    state[cp + "small_to_mtp_projection.weight"] = _r(dH, H)
    state[cp + "small_to_mtp_projection.bias"] = _r(dH)
    for i in range(n_cp):
        state[cp + f"model.codec_embedding.{i}.weight"] = _r(60, dH)
        state[cp + f"lm_head.{i}.weight"] = _r(60, dH)
    model_dir = _write_sharded(tmp_path, state)

    model = Qwen3TTSLM(
        dtype=jnp.float32,
        debug_backbone=BackboneConfig(
            vocab_size=3072, hidden_size=H, num_layers=L, num_heads=heads,
            num_kv_heads=kvh, head_dim=hd, intermediate_size=ffn,
            qk_norm=True, rope_theta=1e6, dtype=jnp.float32),
        debug_depth=DepthConfig(
            hidden_size=dH, num_layers=dL, num_heads=4, num_kv_heads=2,
            head_dim=8, intermediate_size=64, max_seq=17, qk_norm=True,
            dtype=jnp.float32))
    model.model_name = model_dir
    loaded = model._load_checkpoint()
    assert loaded is not None, "mapping raised and fell back"

    _assert_backbone_mapped(loaded["backbone"], state, t, L, qk_norm=True)
    _assert_backbone_mapped(loaded["depth"]["backbone"], state,
                            cp + "model.", dL, qk_norm=True)
    np.testing.assert_array_equal(np.asarray(loaded["codec_embedding"]),
                                  state[t + "codec_embedding.weight"])
    np.testing.assert_array_equal(
        np.asarray(loaded["text_projection"]["fc1"]["w"]),
        state["talker.text_projection.linear_fc1.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(loaded["text_projection"]["fc2"]["b"]),
        state["talker.text_projection.linear_fc2.bias"])
    np.testing.assert_array_equal(np.asarray(loaded["codec_head"]),
                                  state["talker.codec_head.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(loaded["depth"]["proj"]["w"]),
        state[cp + "small_to_mtp_projection.weight"].T)
    for i in range(n_cp):
        np.testing.assert_array_equal(
            np.asarray(loaded["depth"]["embeds"][i]),
            state[cp + f"model.codec_embedding.{i}.weight"])
        np.testing.assert_array_equal(
            np.asarray(loaded["depth"]["heads"][i]),
            state[cp + f"lm_head.{i}.weight"].T)


def test_resolve_model_dir_prefers_local_dir(tmp_path):
    from vox_serve_tpu.weights import resolve_model_dir

    assert resolve_model_dir(str(tmp_path)) == tmp_path
    assert resolve_model_dir("definitely/not-a-model-zzz") is None
