"""Qwen3-TTS (small dims) through the full worker path: dual-channel prompt,
depth-scan codebooks, feedback features, streaming codec."""

import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.qwen3_codec import Qwen3CodecConfig
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.depth import DepthConfig
from vox_serve_tpu.models.qwen3_tts import (
    CODEC_BOS, CODEC_EOS, CODEC_PAD, TTS_BOS, TTS_EOS, TTS_PAD, Qwen3TTSLM,
)
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

SMALL_BACKBONE = BackboneConfig(
    vocab_size=3072, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, qk_norm=True,
    rope_theta=1e6, dtype=jnp.float32,
)
SMALL_DEPTH = DepthConfig(
    hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    intermediate_size=64, max_seq=17, qk_norm=True, dtype=jnp.float32,
)
SMALL_CODEC = Qwen3CodecConfig(
    codebook_dim=32, codebook_size=2048, latent_dim=48, decoder_dim=64,
    hidden_size=32, intermediate_size=64, head_dim=16, num_heads=4,
    num_kv_heads=4, num_layers=2, num_quantizers=16, sliding_window=48,
    upsample_rates=(4, 3), upsampling_ratios=(2, 2), vq_dim=16,
)


@pytest.fixture(scope="module")
def model():
    return Qwen3TTSLM(dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                      debug_depth=SMALL_DEPTH, debug_codec=SMALL_CODEC)


def test_prompt_structure_custom_voice(model):
    po = model.preprocess(prompt="hello", language="english", speaker="ryan")
    toks, masks = po.input_tokens, po.input_masks
    assert toks.shape[1] == 17
    # role rows (first 3) are text-only
    assert not masks[0, -1] and not masks[2, -1]
    # then codec think-prefix rows carry tts_pad on the text channel
    assert toks[3, -1] == TTS_PAD
    assert masks[3, -1]
    # final two rows: tts_eos + codec_pad, tts_pad + codec_bos
    assert toks[-2, -1] == TTS_EOS and toks[-2, 0] == CODEC_PAD
    assert toks[-1, -1] == TTS_PAD and toks[-1, 0] == CODEC_BOS
    assert po.input_features.shape == (len(toks), 64)


def test_prompt_structure_streaming_mode(model):
    po = model.preprocess(prompt=None, streaming_first_token=1234,
                          language="english", speaker="ryan")
    toks = po.input_tokens
    # streaming: last row is the single text token paired with codec_bos,
    # and no tts_eos row
    assert toks[-1, -1] == 1234
    assert toks[-1, 0] == CODEC_BOS
    assert TTS_EOS not in toks[:, -1].tolist()


def test_full_generation_through_worker(model):
    wcfg = WorkerConfig(max_batch_size=2, num_pages=256, page_size=16,
                        prefill_token_buckets=(64,), max_prefill_requests=2,
                        warmup=False)
    worker = ModelWorker(model, wcfg)
    assert worker.feedback is not None  # depth feedback buffer exists
    req = Request(request_id="q1", prompt="hello world")
    worker.run_lm_prefill([req])
    assert req.done_lm_prefill
    tok0 = req.lm_output_tokens[0]
    assert tok0.shape == (17,)
    assert tok0[-1] == TTS_PAD  # text channel pad
    # depth codebooks must be filled (cols 1..15 within depth vocab)
    assert np.all(tok0[1:16] >= 0) and np.all(tok0[1:16] < 2048)

    for _ in range(12):
        if req.done_lm_generation:
            break
        worker.run_lm_decode([req])
    assert req.num_generated >= 2

    # detokenize one 10-frame chunk through the streaming codec
    while len(req.lm_output_audio_tokens) < 10 and not req.done_lm_generation:
        worker.run_lm_decode([req])
    if len(req.lm_output_audio_tokens) >= 10:
        req.next_audio_decode_idx = [0]
        worker.run_detokenize([req])
        pcm = req.output_audio.get_nowait()
        assert len(pcm) == 10 * SMALL_CODEC.samples_per_frame * 2
    worker.free_kv_cache(req)


def test_stop_semantics(model):
    req = Request(request_id="s", prompt="x")
    row = np.zeros(17, np.int32)
    row[0] = CODEC_EOS
    model.update_request_state(req, row)
    assert req.done_lm_generation
    assert len(req.lm_output_audio_tokens) == 0


def test_suppress_bias(model):
    import jax

    logits = jnp.zeros((1, 1, 3072))
    adj = model.adjust_logits(logits)
    a = np.asarray(adj[0, 0])
    assert a[2048] < -1e30          # suppressed band
    assert a[CODEC_EOS] == 0.0      # EOS exempt
    assert a[100] == 0.0            # normal tokens untouched


def test_icl_ref_codes_prompt_structure():
    """Base-variant ICL voice clone: ref-code rows carry codebook-0 ids on
    the codec channel and presummed depth-codebook embeddings in
    input_features (reference qwen3_tts.py:1692-1746)."""
    m = Qwen3TTSLM(model_name="Qwen/Qwen3-TTS-12Hz-1.7B-Base",
                   dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                   debug_depth=SMALL_DEPTH, debug_codec=SMALL_CODEC)
    assert m.tts_model_type == "base"
    rng = np.random.default_rng(0)
    ref_codes = rng.integers(0, 2048, size=(6, 16))
    po = m.preprocess(prompt="hello", language="english",
                      ref_text="reference words", ref_codes=ref_codes)
    toks, masks, feats = po.input_tokens, po.input_masks, po.input_features
    # last 6 rows are the ref-code frames: tts_pad text + cb0 codec ids
    assert np.all(toks[-6:, -1] == TTS_PAD)
    assert np.array_equal(toks[-6:, 0], ref_codes[:, 0])
    assert np.all(masks[-6:, -1])
    # features hold the presummed depth embeddings (nonzero)
    assert np.abs(feats[-6:]).max() > 0
    # row before the ref codes is tts_pad + codec_bos
    assert toks[-7, -1] == TTS_PAD and toks[-7, 0] == CODEC_BOS
    # x-vector row exists (codec_pad on codec channel) before tts_bos
    bos_row = int(np.where(toks[:, -1] == TTS_BOS)[0][0])
    assert toks[bos_row - 1, 0] == CODEC_PAD

    # expected presum: depth embeds of codebooks 1..15
    depth_embeds = np.asarray(m.params["depth"]["embeds"], np.float32)
    cb = ref_codes[:, 1:16]
    expect = depth_embeds[np.arange(15)[None, :], cb, :].sum(axis=1)
    np.testing.assert_allclose(feats[-6:], expect, rtol=1e-5, atol=1e-5)


def test_icl_rejected_for_input_streaming():
    m = Qwen3TTSLM(model_name="Qwen/Qwen3-TTS-12Hz-1.7B-Base",
                   dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                   debug_depth=SMALL_DEPTH, debug_codec=SMALL_CODEC)
    with pytest.raises(ValueError):
        m.preprocess(streaming_first_token=5, language="english",
                     ref_codes=np.zeros((4, 16), np.int64))


def test_xvector_from_wav(tmp_path):
    """With speaker-encoder weights present, the x-vector row becomes a real
    ECAPA embedding of the reference audio."""
    import wave

    import jax

    from vox_serve_tpu.encoders.ecapa import EcapaConfig, init_ecapa

    m = Qwen3TTSLM(model_name="Qwen/Qwen3-TTS-12Hz-1.7B-Base",
                   dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                   debug_depth=SMALL_DEPTH, debug_codec=SMALL_CODEC)
    m._spk_enc_cfg = EcapaConfig(mel_dim=24, enc_dim=64,
                                 channels=(16, 16, 16, 16, 48),
                                 se_channels=8, attention_channels=8)
    m._spk_enc_params = init_ecapa(m._spk_enc_cfg, jax.random.key(0))

    p = str(tmp_path / "ref.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        pcm = (np.sin(np.arange(12000) * 0.04) * 8000).astype(np.int16)
        w.writeframes(pcm.tobytes())

    emb = m._extract_speaker_embedding(p)
    assert emb.shape == (64,)
    assert np.abs(emb).max() > 0
    # deterministic
    np.testing.assert_array_equal(emb, m._extract_speaker_embedding(p))
