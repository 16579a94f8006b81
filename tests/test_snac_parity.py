"""Golden parity: JAX SNAC decode vs the reference torch SNAC through
load_snac_params (Orpheus codec; noise path disabled for determinism on the
reference side by zeroing its randn)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.codecs.snac import (  # noqa: E402
    SNACConfig, load_snac_params, snac_decode,
)

CFG = SNACConfig(decoder_dim=32, decoder_rates=(2, 2), latent_dim=32,
                 codebook_size=16, codebook_dim=4, vq_strides=(2, 1),
                 noise=True, depthwise=True, attn_window_size=None)


def test_decode_matches_reference(monkeypatch):
    sn = import_reference("vox_serve.tokenizer.snac")
    torch.manual_seed(0)
    m = sn.SNAC(sampling_rate=24000, encoder_dim=8, encoder_rates=[2, 2],
                decoder_dim=CFG.decoder_dim, decoder_rates=list(CFG.decoder_rates),
                vq_strides=list(CFG.vq_strides), codebook_size=CFG.codebook_size,
                codebook_dim=CFG.codebook_dim, noise=True, depthwise=True,
                attn_window_size=None)
    m.eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = load_snac_params(sd, CFG)

    rng = np.random.default_rng(4)
    T = 8
    codes = [
        torch.from_numpy(rng.integers(0, CFG.codebook_size,
                                      size=(1, T // s)).astype(np.int64))
        for s in CFG.vq_strides
    ]
    # deterministic: zero the NoiseBlock's randn on the reference side
    monkeypatch.setattr(torch, "randn", lambda *s, **k: torch.zeros(*s, **{
        kk: vv for kk, vv in k.items() if kk in ("device", "dtype")}))
    with torch.no_grad():
        ref = m.decode(codes).numpy()
    ours = np.asarray(snac_decode(
        params, CFG, [jnp.asarray(c.numpy(), jnp.int32) for c in codes]))
    assert ours.shape == ref.shape
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel


def test_dac_decode_matches_hf():
    """DAC (Zonos codec) weight mapping: HF DacModel decode parity
    (reference tokenizer/dac.py loads descript/dac_44khz via DacModel)."""
    from transformers.models.dac import DacConfig, DacModel

    from vox_serve_tpu.codecs.snac import load_dac_params

    n_cb = 3
    dcfg = DacConfig(
        encoder_hidden_size=16, downsampling_ratios=[2, 4],
        decoder_hidden_size=24, upsampling_ratios=[4, 2],
        codebook_size=32, codebook_dim=4, n_codebooks=n_cb, hidden_size=24,
        sampling_rate=44100)
    torch.manual_seed(1)
    m = DacModel(dcfg)
    m.eval()
    cfg = SNACConfig(
        sampling_rate=44100, decoder_dim=24, decoder_rates=(4, 2),
        latent_dim=24, codebook_size=32, codebook_dim=4,
        vq_strides=(1,) * n_cb, noise=False, depthwise=False,
        attn_window_size=None)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = load_dac_params(sd, cfg)

    rng = np.random.default_rng(7)
    T = 12
    codes_t = torch.from_numpy(
        rng.integers(0, 32, size=(1, n_cb, T)).astype(np.int64))
    with torch.no_grad():
        ref = m.decode(audio_codes=codes_t).audio_values.numpy()
    codes_j = [jnp.asarray(codes_t[:, i].numpy(), jnp.int32)
               for i in range(n_cb)]
    ours = np.asarray(snac_decode(params, cfg, codes_j))[:, 0]
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel
