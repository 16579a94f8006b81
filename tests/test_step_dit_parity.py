"""Golden parity: JAX Step-Audio-2 DiT flow vs the reference torch modules
(DiT estimator alone + the full encoder->CFM chunk with matched noise)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.codecs.step_dit import (  # noqa: E402
    StepFlowConfig, _dit_forward, load_step_flow_params, step_flow_forward,
)

CFG = StepFlowConfig(num_blocks=2, up_blocks=1, linear_units=128,
                     vocab_size=100, dit_depth=2, dit_hidden=64,
                     dit_heads=4, dit_head_dim=16, n_timesteps=10)


@pytest.fixture(scope="module")
def ref_mod():
    return import_reference("vox_serve.tokenizer.step_audio_2")


@pytest.fixture(scope="module")
def ref_flow(ref_mod):
    sa = ref_mod
    torch.manual_seed(0)
    enc = sa.UpsampleConformerEncoderV2(
        input_size=512, output_size=512, attention_heads=8,
        linear_units=CFG.linear_units, num_blocks=CFG.num_blocks,
        num_up_blocks=CFG.up_blocks, pre_lookahead_len=CFG.pre_lookahead,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0)
    dit = sa.DiT(in_channels=320, out_channels=80, depth=CFG.dit_depth,
                 num_heads=CFG.dit_heads, head_dim=CFG.dit_head_dim,
                 hidden_size=CFG.dit_hidden)
    cfm = sa.CausalConditionalCFM(estimator=dit, inference_cfg_rate=0.7)
    flow = sa.CausalMaskedDiffWithXvec(
        input_size=512, output_size=80, spk_embed_dim=CFG.spk_dim,
        vocab_size=CFG.vocab_size, encoder=enc, decoder=cfm)
    flow.eval()
    return flow


@pytest.fixture(scope="module")
def mapped(ref_flow):
    sd = {k: v.detach().numpy() for k, v in ref_flow.state_dict().items()}
    return load_step_flow_params(sd, CFG)


def test_dit_estimator_parity(ref_flow, mapped):
    dit = ref_flow.decoder.estimator
    rng = np.random.default_rng(2)
    B, T = 2, 12
    x = rng.normal(size=(B, 80, T)).astype(np.float32)
    mu = rng.normal(size=(B, 80, T)).astype(np.float32)
    spks = rng.normal(size=(B, 80)).astype(np.float32)
    cond = rng.normal(size=(B, 80, T)).astype(np.float32)
    t = np.asarray([0.3], np.float32)
    with torch.no_grad():
        ref, _, _ = dit.forward_chunk(
            x=torch.from_numpy(x), mu=torch.from_numpy(mu),
            t=torch.from_numpy(t).repeat(2), spks=torch.from_numpy(spks),
            cond=torch.from_numpy(cond))
    ref = ref.numpy()
    ours = np.asarray(_dit_forward(
        mapped["estimator"], CFG, jnp.asarray(x), jnp.asarray(mu),
        jnp.full((B,), 0.3), jnp.asarray(spks), jnp.asarray(cond)))
    assert ours.shape == ref.shape
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel


def test_step_flow_full_parity(ref_flow, mapped, monkeypatch):
    """inference_chunk: tokens (with pre-lookahead context) -> mel; matched
    noise on both sides."""
    rng = np.random.default_rng(3)
    B, T = 1, 12  # 3 of which are lookahead context
    tokens = rng.integers(0, CFG.vocab_size, size=(B, T))
    T2 = 2 * (T - CFG.pre_lookahead)
    noise = rng.normal(size=(1, 80, T2)).astype(np.float32)
    spk = rng.normal(size=(B, CFG.spk_dim)).astype(np.float32)
    cond = np.zeros((B, T2, 80), np.float32)

    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (1, 80, T2):
            return torch.from_numpy(noise.copy())
        return real_randn(*shape, **kw)

    monkeypatch.setattr(torch, "randn", fixed_randn)
    cache = {"conformer_cnn_cache": None, "conformer_att_cache": None,
             "estimator_cnn_cache": None, "estimator_att_cache": None}
    with torch.no_grad():
        res = ref_flow.inference_chunk(
            token=torch.from_numpy(tokens), spk=torch.from_numpy(spk),
            cache=cache, last_chunk=False)
    ref = (res[0] if isinstance(res, tuple) else res).numpy()
    ours = np.asarray(step_flow_forward(
        mapped, CFG, jnp.asarray(tokens, jnp.int32), jnp.ones((B, T), bool),
        jnp.asarray(spk), jnp.asarray(cond), jax.random.key(0),
        context=CFG.pre_lookahead, noise=jnp.asarray(noise)))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 5e-4, rel
