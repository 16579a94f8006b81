"""Golden parity: JAX ECAPA speaker encoder vs the reference torch module
(Qwen3TTSSpeakerEncoder), including the mel front-end."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

from vox_serve_tpu.encoders.ecapa import (  # noqa: E402
    EcapaConfig, ecapa_embed, load_ecapa_params, qwen3_speaker_mel,
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_reference("vox_serve.model.qwen3_tts")


def test_speaker_encoder_matches_reference(ref_mod):
    torch.manual_seed(0)
    rcfg = ref_mod.Qwen3TTSSpeakerEncoderConfig()
    enc = ref_mod.Qwen3TTSSpeakerEncoder(rcfg)
    enc.eval()

    cfg = EcapaConfig(mel_dim=rcfg.mel_dim, enc_dim=rcfg.enc_dim,
                      channels=tuple(rcfg.enc_channels),
                      kernel_sizes=tuple(rcfg.enc_kernel_sizes),
                      dilations=tuple(rcfg.enc_dilations),
                      res2net_scale=rcfg.enc_res2net_scale,
                      se_channels=rcfg.enc_se_channels,
                      attention_channels=rcfg.enc_attention_channels)
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = load_ecapa_params(sd, cfg)

    rng = np.random.default_rng(7)
    mel = rng.normal(size=(2, 60, cfg.mel_dim)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(mel)).numpy()
    ours = np.asarray(ecapa_embed(params, cfg, mel))
    assert ours.shape == ref.shape == (2, cfg.enc_dim)
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel


def test_mel_frontend_matches_reference(ref_mod):
    rng = np.random.default_rng(11)
    audio = (rng.normal(size=(24000,)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod.mel_spectrogram(
            torch.from_numpy(audio).unsqueeze(0), n_fft=1024, num_mels=128,
            sampling_rate=24000, hop_size=256, win_size=1024, fmin=0,
            fmax=12000).numpy()[0].T  # (T, n_mels)
    ours = qwen3_speaker_mel(audio, n_mels=128)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
