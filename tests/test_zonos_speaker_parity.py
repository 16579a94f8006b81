"""Golden parity: Zonos speaker-embedding net (ResNet/SimAM + ASP + LDA) vs
the reference torch modules (encoder/zonos.py), on a reduced block count
(the weight-mapping walks the same names at any depth)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import vox_serve_tpu.encoders.zonos_speaker as zs  # noqa: E402
from vox_serve_tpu.encoders.zonos_speaker import (  # noqa: E402
    load_zonos_speaker_params, zonos_speaker_forward,
)

BLOCKS = (2, 2, 2, 2)
IN_PLANES = 16


@pytest.fixture(scope="module")
def ref_model():
    enc = import_reference("vox_serve.encoder.zonos")
    nn = torch.nn

    class Small(nn.Module):
        def __init__(self):
            super().__init__()
            self.front = enc.ResNet(IN_PLANES, enc.SimAMBasicBlock,
                                    list(BLOCKS))
            self.pooling = enc.ASP(IN_PLANES, 80)
            self.bottleneck = nn.Linear(self.pooling.out_dim, 256)
            self.lda = nn.Linear(256, 128)

        def forward(self, mel):
            x = self.front(mel.unsqueeze(1))
            x = self.pooling(x)
            emb = self.bottleneck(x)
            return emb, self.lda(emb)

    torch.manual_seed(0)
    m = Small()
    # non-trivial BN statistics so the parity is meaningful
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_speaker_net_parity(ref_model, monkeypatch):
    monkeypatch.setattr(zs, "NUM_BLOCKS", BLOCKS)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    lda_sd = {"weight": sd.pop("lda.weight"), "bias": sd.pop("lda.bias")}
    params = load_zonos_speaker_params(sd, lda_sd)

    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 80, 48)).astype(np.float32)
    with torch.no_grad():
        ref_emb, ref_lda = ref_model(torch.from_numpy(mel))
    emb, lda = zonos_speaker_forward(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(emb), ref_emb[0].numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lda), ref_lda[0].numpy(),
                               rtol=2e-3, atol=2e-3)


def test_log_fbank_shape_and_stats():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    mel = zs.log_fbank(wav)
    assert mel.shape[:2] == (1, 80)
    # per-bin mean subtraction
    np.testing.assert_allclose(mel.mean(axis=2), 0.0, atol=1e-4)


def test_extract_speaker_embedding_smoke():
    import jax

    params = zs.init_zonos_speaker_params(jax.random.key(0),
                                          scale_blocks=(1, 1, 1, 1),
                                          in_planes=8)
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(24000).astype(np.float32) * 0.1
    out = zs.extract_speaker_embedding(params, wav, sr=24000)
    assert out.shape == (128,)
    assert np.isfinite(out).all()
