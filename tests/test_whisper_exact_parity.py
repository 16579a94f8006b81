"""Golden parity: weight-exact GLM Whisper-VQ + Step-Audio-2 encoders vs the
reference torch modules (reduced depth — the mapping walks the same names at
any depth)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.encoders.whisper_exact import (  # noqa: E402
    GLMVQConfig, StepEncConfig, glm_vq_encode, load_glm_vq_params,
    load_step_encoder_params, slaney_mel_filters, step_adaptor, step_encode,
    whisper_log_mel,
)


def test_slaney_mel_matches_transformers():
    # transformers' mel_filter_bank(norm="slaney", mel_scale="slaney") is the
    # librosa implementation both reference encoders rely on
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=128, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney")
    ours = slaney_mel_filters(128)
    np.testing.assert_allclose(ours, ref.T, rtol=1e-5, atol=1e-7)


def test_whisper_log_mel_matches_reference():
    sa = import_reference("vox_serve.encoder.step_audio_2")
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ref = sa.log_mel_spectrogram(torch.from_numpy(wav), n_mels=128,
                                 padding=479).numpy()
    ours = whisper_log_mel(wav, n_mels=128, padding=479)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# GLM Whisper-VQ
# ---------------------------------------------------------------------------
GLM_CFG = GLMVQConfig(n_mels=16, d_model=64, heads=4, ffn=128, layers=3,
                      pool=4, block=8, vocab=32, max_positions=256)


@pytest.fixture(scope="module")
def glm_ref():
    gm = import_reference("vox_serve.encoder.glm")
    cfg = gm.GLMEncoderConfig(
        num_mel_bins=16, d_model=64, encoder_attention_heads=4,
        encoder_ffn_dim=128, quantize_position=3, pooling_position=3,
        pooling_kernel_size=4, quantize_causal_block_size=8,
        quantize_vocab_size=32, max_source_positions=256)
    torch.manual_seed(0)
    enc = gm.GLMWhisperVQEncoder(cfg)
    enc.eval()
    # the reference builds the mask in bf16 (fp16-serving assumption,
    # encoder/glm.py:263); cast to f32 for an f32 parity run
    orig = enc.get_block_causal_attention_mask
    enc.get_block_causal_attention_mask = (
        lambda *a, **k: orig(*a, **k).float())
    return gm, enc


def test_glm_vq_parity(glm_ref):
    gm, enc = glm_ref
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = load_glm_vq_params(sd, GLM_CFG)

    rng = np.random.default_rng(2)
    T_mel = 64  # -> 32 frames -> 8 tokens
    mel = rng.standard_normal((1, 16, T_mel)).astype(np.float32)
    attn_mask = torch.ones(1, T_mel, dtype=torch.long)
    with torch.no_grad():
        ref_tokens = enc(torch.from_numpy(mel), attn_mask).numpy()
    ours = np.asarray(glm_vq_encode(params, GLM_CFG, jnp.asarray(mel),
                                    valid_frames=T_mel // 2))
    np.testing.assert_array_equal(ours, ref_tokens)


def test_glm_vq_padding_mask(glm_ref):
    """Padded tail must not change the tokens of the valid prefix."""
    gm, enc = glm_ref
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = load_glm_vq_params(sd, GLM_CFG)

    rng = np.random.default_rng(3)
    valid_mel = 48
    mel = rng.standard_normal((1, 16, 64)).astype(np.float32)
    mel[:, :, valid_mel:] = 0.0
    attn = torch.zeros(1, 64, dtype=torch.long)
    attn[:, :valid_mel] = 1
    with torch.no_grad():
        ref_tokens = enc(torch.from_numpy(mel), attn).numpy()
    ours = np.asarray(glm_vq_encode(params, GLM_CFG, jnp.asarray(mel),
                                    valid_frames=valid_mel // 2))
    n_valid = valid_mel // 2 // 4
    np.testing.assert_array_equal(ours[:, :n_valid],
                                  ref_tokens[:, :n_valid])


# ---------------------------------------------------------------------------
# Step-Audio-2 encoder + adaptor
# ---------------------------------------------------------------------------
STEP_CFG = StepEncConfig(n_mels=16, d_model=64, heads=4, layers=3,
                         max_positions=256, llm_dim=48, adapter_hidden=32,
                         adapter_kernel=7, adapter_stride=4)


@pytest.fixture(scope="module")
def step_ref():
    sa = import_reference("vox_serve.encoder.step_audio_2")
    sm = import_reference("vox_serve.model.step_audio_2")
    torch.manual_seed(1)
    enc = sa.StepAudio2Encoder(n_mels=16, n_ctx=256, n_state=64, n_head=4,
                               n_layer=3)
    ada = sm.StepAudio2Adaptor(n_state=64, n_hidden=48, kernel_size=7,
                               stride=4)
    # shrink the hidden linear to the test config
    ada.linear1 = torch.nn.Linear(64, 32)
    ada.linear2 = torch.nn.Linear(32, 48)
    torch.manual_seed(2)
    for m in (ada.linear1, ada.linear2):
        torch.nn.init.normal_(m.weight, 0, 0.1)
        torch.nn.init.zeros_(m.bias)
    enc.eval()
    ada.eval()
    return enc, ada


def test_step_encoder_parity(step_ref):
    enc, ada = step_ref
    sd = {"encoder." + k: v.detach().numpy()
          for k, v in enc.state_dict().items()}
    sd.update({"adapter." + k: v.detach().numpy()
               for k, v in ada.state_dict().items()})
    params = load_step_encoder_params(sd, STEP_CFG)

    rng = np.random.default_rng(4)
    T_mel = 64
    mel = rng.standard_normal((1, 16, T_mel)).astype(np.float32)
    x_len = torch.tensor([T_mel])
    with torch.no_grad():
        ref_feat, ref_len = enc(torch.from_numpy(mel), x_len)
        ref_out = ada(ref_feat)
    feat = step_encode(params, STEP_CFG, jnp.asarray(mel),
                       valid_frames=T_mel)
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(),
                               rtol=2e-3, atol=2e-3)
    out = step_adaptor(params, STEP_CFG, feat)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-3, atol=2e-3)
