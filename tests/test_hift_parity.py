"""Golden parity: JAX HiFT vocoder vs the reference torch HiFTGenerator
through load_hift_params (f0 predictor + the full deterministic decode trunk
driven by a fixed excitation; only the stochastic sine-noise source remains
an approximation, documented in codecs/hifigan.py)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.codecs.hifigan import (  # noqa: E402
    HiFTConfig, _f0_predictor, hift_decode, load_hift_params,
)

CFG = HiFTConfig()  # real architecture (base 512, rates 8/5/3, istft 16/4)


@pytest.fixture(scope="module")
def ref_hift():
    hf = import_reference("vox_serve.tokenizer.hifigan")
    torch.manual_seed(0)
    m = hf.HiFTGenerator(device=torch.device("cpu"))
    m.eval()
    return m


@pytest.fixture(scope="module")
def mapped(ref_hift):
    sd = {k: v.detach().numpy() for k, v in ref_hift.state_dict().items()}
    return load_hift_params(sd, CFG)


def test_f0_predictor_parity(ref_hift, mapped):
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(2, 80, 12)).astype(np.float32)
    with torch.no_grad():
        ref = ref_hift.f0_predictor(torch.from_numpy(mel)).numpy()
    ours = np.asarray(_f0_predictor(mapped, jnp.asarray(mel)))
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel


def test_decode_trunk_parity_fixed_source(ref_hift, mapped):
    """Reference decode(x=mel, s=source) is deterministic; drive both with
    the same excitation (our source_cache covering the whole chunk replaces
    the generated source entirely)."""
    rng = np.random.default_rng(2)
    T = 12
    mel = rng.normal(size=(1, 80, T)).astype(np.float32)
    S = T * CFG.total_upsample
    src = (rng.normal(size=(1, 1, S)) * 0.05).astype(np.float32)
    with torch.no_grad():
        ref = ref_hift.decode(torch.from_numpy(mel),
                              torch.from_numpy(src)).numpy()
    ours, _ = hift_decode(mapped, CFG, jnp.asarray(mel),
                          source_cache=jnp.asarray(src))
    ours = np.asarray(ours)
    assert ours.shape == ref.shape
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 2e-3, rel
