"""Golden parity: Chatterbox T3 conditioning encoder (perceiver +
speaker/emotion projections) vs the reference torch modules."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.encoders.chatterbox_cond import (  # noqa: E402
    chatterbox_cond_encode, chatterbox_perceiver, load_chatterbox_cond_params,
)


class _HP:
    encoder_type = "voice_encoder"
    speaker_embed_size = 256
    n_channels = 1024
    emotion_adv = True
    use_perceiver_resampler = True


@pytest.fixture(scope="module")
def ref():
    cm = import_reference("vox_serve.encoder.chatterbox")
    torch.manual_seed(0)
    enc = cm.ChatterboxCondEnc(_HP())
    # keep the flash path: it is standard SDPA (the reference's non-flash
    # einsum is broken for cross-attention — mismatched length axes — and
    # never used in serving, encoder/chatterbox.py:113-119)
    enc.eval()
    return cm, enc


@pytest.fixture(scope="module")
def params(ref):
    _, enc = ref
    sd = {"cond_enc." + k: v.detach().numpy()
          for k, v in enc.state_dict().items()}
    return load_chatterbox_cond_params(sd)


def test_perceiver_parity(ref, params):
    cm, enc = ref
    rng = np.random.default_rng(1)
    h = rng.standard_normal((1, 40, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        expected = enc.perceiver(torch.from_numpy(h)).numpy()
    ours = np.asarray(chatterbox_perceiver(params, jnp.asarray(h[0])[None]))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, rtol=2e-3, atol=2e-3)


def test_cond_enc_parity(ref, params):
    cm, enc = ref
    rng = np.random.default_rng(2)
    spk = rng.standard_normal(256).astype(np.float32)
    prompt = rng.standard_normal((1, 25, 1024)).astype(np.float32) * 0.3
    cond = cm.T3Cond(
        speaker_emb=torch.from_numpy(spk)[None],
        cond_prompt_speech_tokens=torch.zeros(1, 25, dtype=torch.long),
        cond_prompt_speech_emb=torch.from_numpy(prompt),
        emotion_adv=0.5 * torch.ones(1, 1, 1))
    with torch.no_grad():
        expected = enc(cond)[0].numpy()
    ours = np.asarray(chatterbox_cond_encode(
        params, jnp.asarray(spk), jnp.asarray(prompt[0]), 0.5))
    assert ours.shape == expected.shape  # (34, 1024)
    np.testing.assert_allclose(ours, expected, rtol=2e-3, atol=2e-3)
