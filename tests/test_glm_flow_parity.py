"""Golden parity: JAX GLM flow vs the reference torch GLMFlowModel
(block-conformer encoder, interpolate regulator, non-causal U-Net CFM)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.codecs.glm_flow import (  # noqa: E402
    GLMFlowConfig, glm_flow_forward, load_glm_flow_params,
)

CFG = GLMFlowConfig(num_blocks=2, linear_units=128, vocab_size=100,
                    est_channels=(32, 32), est_head_dim=8, est_heads=4,
                    est_n_blocks=1, est_mid_blocks=2, n_timesteps=10)


@pytest.fixture(scope="module")
def ref_flow():
    g = import_reference("vox_serve.tokenizer.glm")
    torch.manual_seed(0)
    enc = g.BlockConformerEncoder(
        input_size=512, output_size=512, attention_heads=8,
        linear_units=CFG.linear_units, num_blocks=CFG.num_blocks,
        block_size=CFG.block_size)
    est = g.ConditionalDecoder(
        in_channels=320, out_channels=80, channels=list(CFG.est_channels),
        attention_head_dim=CFG.est_head_dim, n_blocks=CFG.est_n_blocks,
        num_mid_blocks=CFG.est_mid_blocks, num_heads=CFG.est_heads)
    cfm = g.ConditionalCFM(estimator=est)
    flow = g.GLMFlowModel(vocab_size=CFG.vocab_size,
                          encoder=enc,
                          length_regulator=g.InterpolateRegulator(),
                          decoder=cfm)
    flow.eval()
    return flow


def test_glm_flow_full_parity(ref_flow, monkeypatch):
    sd = {k: v.detach().numpy() for k, v in ref_flow.state_dict().items()}
    params = load_glm_flow_params(sd, CFG)

    rng = np.random.default_rng(1)
    B, T = 1, 25
    tokens = rng.integers(0, CFG.vocab_size, size=(B, T))
    F = CFG.feat_len(T)
    noise = rng.normal(size=(B, 80, F)).astype(np.float32)

    monkeypatch.setattr(
        torch, "randn_like",
        lambda x, **k: torch.from_numpy(noise.copy()).to(x.dtype))
    with torch.no_grad():
        ref = ref_flow.inference(
            torch.from_numpy(tokens), torch.tensor([T] * B),
            torch.zeros(B, CFG.spk_dim)).numpy()
    ours = np.asarray(glm_flow_forward(
        params, CFG, jnp.asarray(tokens, jnp.int32),
        jnp.zeros((B, CFG.spk_dim)), jax.random.key(0),
        noise=jnp.asarray(noise)))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 5e-4, rel


def test_glm_flow_parameter_count(ref_flow):
    sd = {k: v.detach().numpy() for k, v in ref_flow.state_dict().items()}
    params = load_glm_flow_params(sd, CFG)
    ref_n = sum(v.size for v in sd.values())
    ours_n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert ours_n == ref_n, (ours_n, ref_n)
