"""Golden parity: JAX Mimi decode vs transformers MimiModel (the codec the
sesame/csm-1b checkpoint embeds under codec_model.*), plus CSM checkpoint
mapping through a synthetic HF-layout state_dict."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.codecs.mimi import (  # noqa: E402
    MimiConfig, load_mimi_params, mimi_decode_chunk, mimi_init_cache,
)

SMALL = dict(num_filters=16, hidden_size=64, intermediate_size=128,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=4, head_dim=16, codebook_dim=32,
             vector_quantization_hidden_dimension=32, codebook_size=64,
             num_quantizers=8, upsample_groups=64, sliding_window=12)

JCFG = MimiConfig(n_codebooks=8, codebook_size=64, vq_dim=32, hidden_size=64,
                  intermediate_size=128, head_dim=16, num_heads=4,
                  num_kv_heads=4, num_layers=2, sliding_window=12,
                  num_filters=16)


@pytest.fixture(scope="module")
def hf_mimi():
    from transformers import MimiConfig as HFMimiConfig, MimiModel

    torch.manual_seed(0)
    m = MimiModel(HFMimiConfig(**SMALL))
    m.eval()
    return m


def test_decode_matches_hf(hf_mimi):
    sd = {k: v.detach().numpy() for k, v in hf_mimi.state_dict().items()}
    params = load_mimi_params(sd, JCFG)

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 64, size=(1, 8, 6))
    with torch.no_grad():
        ref = hf_mimi.decode(torch.from_numpy(codes)).audio_values.numpy()
    ours = np.asarray(mimi_decode_chunk(
        params, JCFG, jnp.asarray(codes, jnp.int32), None)[0])
    assert ours.shape == ref.shape
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel


def test_streaming_matches_hf_full(hf_mimi):
    """Position-exact streaming (unlike the Qwen3 codec's zero-sink ring):
    chunked decode must equal the HF full decode."""
    sd = {k: v.detach().numpy() for k, v in hf_mimi.state_dict().items()}
    params = load_mimi_params(sd, JCFG)

    rng = np.random.default_rng(6)
    codes = rng.integers(0, 64, size=(1, 8, 9))
    with torch.no_grad():
        ref = hf_mimi.decode(torch.from_numpy(codes)).audio_values.numpy()
    cache = mimi_init_cache(JCFG, 1)
    outs = []
    for s in range(0, 9, 3):
        wav, cache = mimi_decode_chunk(
            params, JCFG, jnp.asarray(codes[:, :, s:s + 3], jnp.int32), cache)
        outs.append(np.asarray(wav))
    chunked = np.concatenate(outs, axis=-1)
    rel = np.linalg.norm(chunked - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel


def test_csm_checkpoint_mapping_via_hf_layout():
    """Synthetic sesame/csm-1b state_dict (HF CsmForConditionalGeneration at
    tiny dims) must map losslessly onto CSMLM's pytree."""
    from transformers import CsmConfig, CsmForConditionalGeneration

    from vox_serve_tpu.weights import load_llama_family_backbone

    depth = dict(vocab_size=2051, hidden_size=32, intermediate_size=64,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2, head_dim=8, backbone_hidden_size=64,
                 num_codebooks=32, max_position_embeddings=33)
    cfg = CsmConfig(num_codebooks=32, vocab_size=2051, text_vocab_size=300,
                    hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=16,
                    depth_decoder_config=depth,
                    codec_config={"model_type": "mimi", **SMALL})
    torch.manual_seed(1)
    hf = CsmForConditionalGeneration(cfg)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    bb = load_llama_family_backbone(state, 2, prefix="backbone_model.",
                                    dtype=jnp.float32)
    q = np.asarray(bb["layers"]["attn"]["q"]["w"][0])
    np.testing.assert_allclose(
        q, state["backbone_model.layers.0.self_attn.q_proj.weight"].T,
        rtol=1e-6)

    heads = jnp.asarray(state["depth_decoder.codebooks_head.weight"])
    assert heads.shape == (31, 32, 2051)
    codec = load_mimi_params(state, JCFG, prefix="codec_model.")
    assert codec["dec_conv0"]["w"].shape[1] == 64


def test_encode_matches_hf(hf_mimi):
    from vox_serve_tpu.codecs.mimi import load_mimi_encoder_params, mimi_encode

    sd = {k: v.detach().numpy() for k, v in hf_mimi.state_dict().items()}
    enc = load_mimi_encoder_params(sd, JCFG)
    dec = load_mimi_params(sd, JCFG)

    rng = np.random.default_rng(9)
    audio = (rng.normal(size=(1, 4 * JCFG.frame_samples)) * 0.1
             ).astype(np.float32)
    with torch.no_grad():
        ref = hf_mimi.encode(torch.from_numpy(audio)[:, None, :]
                             ).audio_codes.numpy()
    ours = np.asarray(mimi_encode(enc, dec, JCFG, jnp.asarray(audio)))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    match = (ours == ref).mean()
    assert match > 0.99, match
