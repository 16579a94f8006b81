"""Voice-cloning input paths: S3 FSQ tokenizer, perceiver conditioning,
reference-audio plumbing in Chatterbox and CosyVoice2 preprocess."""

import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.cosyvoice_flow import CosyFlowConfig
from vox_serve_tpu.codecs.glm_flow import GLMFlowConfig
from vox_serve_tpu.codecs.step_dit import StepFlowConfig
from vox_serve_tpu.codecs.hifigan import HiFTConfig
from vox_serve_tpu.encoders.perceiver import (
    PerceiverConfig, init_perceiver, perceiver_resample,
)
from vox_serve_tpu.encoders.s3_exact import (
    S3V2Config, init_s3v2_params, s3v2_encode,
)
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.chatterbox import COND_LEN, ChatterboxLM
from vox_serve_tpu.models.cosyvoice2 import SPEECH_TOKEN_SIZE, CosyVoice2LM

SMALL_COSY_FLOW = CosyFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    up_blocks=1, vocab_size=6561, spk_dim=8, mel_dim=16, est_channels=16,
    est_head_dim=8, est_heads=2, est_n_blocks=1, est_mid_blocks=1,
    n_timesteps=2)
SMALL_STEP_FLOW = StepFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    up_blocks=1, vocab_size=6656, spk_dim=8, mel_dim=16, dit_depth=1,
    dit_hidden=32, dit_heads=2, dit_head_dim=16, n_timesteps=2)
SMALL_GLM_FLOW = GLMFlowConfig(
    input_size=32, output_size=32, heads=4, linear_units=64, num_blocks=1,
    vocab_size=16384, spk_dim=8, mel_dim=16, est_channels=(16, 16),
    est_head_dim=8, est_heads=2, est_n_blocks=1, est_mid_blocks=1,
    n_timesteps=2, regulator_layers=1)
SMALL_HIFT = HiFTConfig(in_channels=16, base_channels=32, nb_harmonics=2,
                        upsample_rates=(8, 5, 3),
                        upsample_kernel_sizes=(16, 11, 7),
                        f0_cond_channels=16)


def _small_backbone(vocab, **kw):
    return BackboneConfig(vocab_size=vocab, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128, dtype=jnp.float32, **kw)


@pytest.fixture()
def ref_wav(tmp_path):
    p = str(tmp_path / "ref.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        pcm = (np.sin(np.arange(24000) * 0.05) * 8000).astype(np.int16)
        w.writeframes(pcm.tobytes())
    return p


def test_s3v2_random_init_shapes_and_determinism():
    """The dev fallback path: the SAME s3_exact implementation under
    random-init params (the s3_tokenizer/s3_exact split is collapsed —
    VERDICT r3 next-step #8)."""
    cfg = S3V2Config(n_mels=20, n_state=32, heads=4, layers=1, rope_dim=8)
    params = init_s3v2_params(jax.random.key(1), cfg)
    mel = jax.random.normal(jax.random.key(2), (2, 20, 24))
    toks = s3v2_encode(params, cfg, mel)
    assert toks.shape == (2, 6)  # two stride-2 convs -> T/4
    assert toks.dtype == jnp.int32
    assert int(toks.min()) >= 0 and int(toks.max()) < cfg.vocab_size
    assert np.array_equal(np.asarray(toks),
                          np.asarray(s3v2_encode(params, cfg, mel)))


def test_perceiver_static_output_and_masking():
    cfg = PerceiverConfig(in_dim=16, hidden=32, heads=4, layers=1,
                          n_latents=8)
    params = init_perceiver(cfg, jax.random.key(3))
    feats = jax.random.normal(jax.random.key(4), (1, 10, 16))
    mask_full = jnp.ones((1, 10), bool)
    out_full = perceiver_resample(params, cfg, feats, mask_full)
    assert out_full.shape == (1, 8, 32)
    # masked tail must not influence the output: same as truncating
    mask_half = jnp.arange(10)[None] < 5
    out_masked = perceiver_resample(params, cfg, feats, mask_half)
    feats_trunc = jnp.concatenate(
        [feats[:, :5], jnp.zeros((1, 5, 16))], axis=1)
    out_trunc = perceiver_resample(params, cfg, feats_trunc, mask_half)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc),
                               atol=1e-5)


def test_chatterbox_clone_conditioning(ref_wav):
    m = ChatterboxLM(
        debug_backbone=_small_backbone(6563, llama31_rope_scaling=True),
        debug_flow=SMALL_COSY_FLOW, debug_hift=SMALL_HIFT)
    neutral = m.preprocess(prompt="hello world")
    clone = m.preprocess(prompt="hello world", audio_path=ref_wav)
    assert np.abs(neutral.input_features[:COND_LEN]).sum() == 0.0
    assert np.abs(clone.input_features[:COND_LEN]).sum() > 0.0
    # deterministic, and text rows unaffected
    clone2 = m.preprocess(prompt="hello world", audio_path=ref_wav)
    np.testing.assert_array_equal(clone.input_features,
                                  clone2.input_features)
    np.testing.assert_array_equal(neutral.input_features[COND_LEN:],
                                  clone.input_features[COND_LEN:])


def test_chatterbox_bad_reference_falls_back(ref_wav, tmp_path):
    m = ChatterboxLM(
        debug_backbone=_small_backbone(6563, llama31_rope_scaling=True),
        debug_flow=SMALL_COSY_FLOW, debug_hift=SMALL_HIFT)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")
    out = m.preprocess(prompt="hello", audio_path=bad)
    assert np.abs(out.input_features[:COND_LEN]).sum() == 0.0  # neutral


def test_cosyvoice2_reference_tokens(ref_wav):
    m = CosyVoice2LM(debug_backbone=BackboneConfig(
        vocab_size=151936, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128, qkv_bias=True,
        dtype=jnp.float32), debug_flow=SMALL_COSY_FLOW, debug_hift=SMALL_HIFT)
    plain = m.preprocess(prompt="hi there")
    clone = m.preprocess(prompt="hi there", audio_path=ref_wav)
    # ICL prompt speech tokens appended after the task id
    assert clone.input_tokens.shape[0] > plain.input_tokens.shape[0]
    extra = clone.input_tokens[plain.input_tokens.shape[0]:, 0]
    assert (extra >= 0).all() and (extra < SPEECH_TOKEN_SIZE).all()
    toks, spk = m._encode_reference(ref_wav)
    assert spk.shape == (SMALL_COSY_FLOW.spk_dim,)
    toks2, spk2 = m._encode_reference(ref_wav)
    np.testing.assert_array_equal(toks, toks2)
    np.testing.assert_allclose(spk, spk2, atol=1e-6)


def test_step_audio2_audio_input(ref_wav):
    from vox_serve_tpu.models.step_audio_2 import AUDIO_MARKER, StepAudio2LM
    m = StepAudio2LM(
        debug_backbone=_small_backbone(158720, qkv_bias=True, rope_dim=8),
        debug_flow=SMALL_STEP_FLOW, debug_hift=SMALL_HIFT)
    empty = m.preprocess(prompt="")
    sts = m.preprocess(prompt="what was said?", audio_path=ref_wav)
    n_markers = int((sts.input_tokens[:, 0] == AUDIO_MARKER).sum())
    assert n_markers > 0
    # reference single-turn layout: the human turn's content is the audio
    # wrapper (<audio_start> patches <audio_end>), REPLACING the text —
    # so vs an empty prompt the delta is markers + the two wrapper tokens
    assert (sts.input_tokens.shape[0]
            > empty.input_tokens.shape[0] + n_markers)
    # marker rows are masked and carry nonzero encoder features
    marker_mask = sts.input_tokens[:, 0] == AUDIO_MARKER
    assert sts.input_masks[marker_mask].all()
    assert np.abs(sts.input_features[marker_mask]).sum() > 0
    # markers sit INSIDE the prompt (not prepended before the system turn)
    first_marker = int(np.nonzero(marker_mask)[0][0])
    assert first_marker > 0


def test_glm_audio_input_tokens(ref_wav):
    from vox_serve_tpu.models.glm_voice import GLMVoiceLM
    m = GLMVoiceLM(
        debug_backbone=_small_backbone(168960, qkv_bias=True, rope_dim=8),
        debug_flow=SMALL_GLM_FLOW, debug_hift=SMALL_HIFT)
    plain = m.preprocess(prompt="hello")
    sts = m.preprocess(prompt="hello", audio_path=ref_wav)
    # audio mode inlines <|audio_k|> strings -> longer token sequence
    assert sts.input_tokens.shape[0] > plain.input_tokens.shape[0]
    sts2 = m.preprocess(prompt="hello", audio_path=ref_wav)
    np.testing.assert_array_equal(sts.input_tokens, sts2.input_tokens)
