"""Golden parity: CAMPPlus x-vector network vs the reference torch module."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.encoders.campplus import (  # noqa: E402
    campplus_embed, load_campplus_params,
)


@pytest.fixture(scope="module")
def ref():
    cm = import_reference("vox_serve.tokenizer.chatterbox")
    torch.manual_seed(0)
    m = cm.CAMPPlus(feat_dim=80, embedding_size=192, memory_efficient=False)
    # non-trivial BN statistics so parity is meaningful
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def test_campplus_parity(ref):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = load_campplus_params(sd)

    rng = np.random.default_rng(1)
    feat = rng.standard_normal((1, 230, 80)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(feat)).numpy()
    ours = np.asarray(campplus_embed(params, jnp.asarray(feat)))
    assert ours.shape == expected.shape  # (1, 192)
    np.testing.assert_allclose(ours, expected, rtol=5e-3, atol=5e-3)


def test_campplus_parity_short_input(ref):
    """T < one 100-frame segment exercises the CAM segment-pool tail."""
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = load_campplus_params(sd)
    rng = np.random.default_rng(2)
    feat = rng.standard_normal((1, 90, 80)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(feat)).numpy()
    ours = np.asarray(campplus_embed(params, jnp.asarray(feat)))
    np.testing.assert_allclose(ours, expected, rtol=5e-3, atol=5e-3)
