"""Golden parity: Perth watermarker (encoder STFT round-trip + 3-branch
decoder) vs the reference torch PerthNet modules."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.watermark.perth import (  # noqa: E402
    PerthConfig, load_perth_params, perth_decode_mag, perth_encode_mag,
    perth_encode_wav, perth_istft, perth_stft,
)

CFG = PerthConfig()


@pytest.fixture(scope="module")
def ref():
    pm = import_reference("vox_serve.watermarker.perth")
    torch.manual_seed(0)
    net = pm.PerthNet(pm.default_hp)
    net.eval()
    # torchaudio is stubbed in ref_compat; Spectrogram(power=None) and
    # InverseSpectrogram are exactly torch.stft/istft with center+reflect
    win = torch.hann_window(2048)

    def spectrogram(x):
        return torch.stft(x, n_fft=2048, hop_length=320, win_length=2048,
                          window=win, center=True, pad_mode="reflect",
                          normalized=False, onesided=True,
                          return_complex=True)

    def inv_spectrogram(spec, length=None):
        return torch.istft(spec, n_fft=2048, hop_length=320,
                           win_length=2048, window=win, center=True,
                           normalized=False, onesided=True, length=length)

    net.ap.spectrogram = spectrogram
    net.ap.inv_spectrogram = inv_spectrogram
    return pm, net


@pytest.fixture(scope="module")
def params(ref):
    _, net = ref
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return load_perth_params(sd, CFG)


def _wav(n=32000, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 32000.0
    x = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return x


def test_stft_matches_reference(ref):
    pm, net = ref
    x = _wav()
    ref_mag, ref_phase = net.ap.signal_to_magphase(torch.from_numpy(x))
    mag, phase = perth_stft(CFG, jnp.asarray(x)[None])
    np.testing.assert_allclose(np.asarray(mag[0]), ref_mag.numpy(),
                               rtol=1e-4, atol=1e-4)
    # phases match where magnitude is meaningful
    m = ref_mag.numpy() > 0.3
    d = np.abs(np.asarray(phase[0]) - ref_phase.numpy())
    d = np.minimum(d, 2 * np.pi - d)
    assert np.quantile(d[m], 0.99) < 1e-2


def test_encoder_parity(ref, params):
    pm, net = ref
    x = _wav(seed=2)
    ref_mag, _ = net.ap.signal_to_magphase(torch.from_numpy(x))
    with torch.no_grad():
        ref_wm, _mask = net.encoder(ref_mag[None])
    mag, _ = perth_stft(CFG, jnp.asarray(x)[None])
    wm = perth_encode_mag(params, CFG, mag)
    np.testing.assert_allclose(np.asarray(wm[0]), ref_wm[0].numpy(),
                               rtol=2e-3, atol=2e-3)


def test_decoder_parity(ref, params):
    pm, net = ref
    x = _wav(seed=3)
    ref_mag, _ = net.ap.signal_to_magphase(torch.from_numpy(x))
    with torch.no_grad():
        ref_conf = net.decoder(ref_mag[None])
    mag, _ = perth_stft(CFG, jnp.asarray(x)[None])
    conf = perth_decode_mag(params, CFG, mag)
    np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(),
                               rtol=5e-3, atol=5e-3)


def test_encode_wav_roundtrip(ref, params):
    """Full encode path matches the reference encode_wav output waveform."""
    pm, net = ref
    x = _wav(seed=4)
    sig = torch.from_numpy(x)
    ref_mag, ref_phase = net.ap.signal_to_magphase(sig)
    with torch.no_grad():
        ref_wm_mag, _ = net.encoder(ref_mag[None])
    ref_wav = net.ap.magphase_to_signal(ref_wm_mag[0], ref_phase)
    ours = perth_encode_wav(params, CFG, jnp.asarray(x)[None])
    n = min(ours.shape[1], ref_wav.shape[-1])
    np.testing.assert_allclose(np.asarray(ours[0, :n]),
                               ref_wav.numpy()[:n], rtol=5e-3, atol=5e-3)


def test_istft_inverts_stft():
    x = _wav(seed=5)
    mag, phase = perth_stft(CFG, jnp.asarray(x)[None])
    back = perth_istft(CFG, mag, phase, len(x))
    np.testing.assert_allclose(np.asarray(back[0]), x, rtol=1e-3, atol=1e-3)


def test_init_watermarker_loads_perth_ckpt(ref, tmp_path, monkeypatch):
    """Serving wiring: a local PerthNet checkpoint routes apply_watermark
    through the weight-compatible encoder (not the dev spectral scheme)."""
    import jax

    from vox_serve_tpu.watermark import (WatermarkConfig, apply_watermark,
                                         init_watermarker)

    pm, net = ref
    ckpt = tmp_path / "perth_net_250000.pth.tar"
    torch.save({"model": net.state_dict(), "step": 250000}, ckpt)
    monkeypatch.setenv("VOX_SERVE_PERTH_CKPT", str(ckpt))

    cfg = WatermarkConfig(style="perth", sample_rate=24000)
    params = init_watermarker(cfg, jax.random.key(0))
    assert "perth" in params

    x = jnp.asarray(_wav(24000, seed=6))[None]
    out = apply_watermark(params, cfg, x)
    assert out.shape == x.shape
    delta = float(jnp.max(jnp.abs(out - x)))
    # a residual was embedded (its SCALE is meaningless for random-init
    # weights — only the trained checkpoint produces subtle marks)
    assert delta > 1e-6 and np.isfinite(delta)
