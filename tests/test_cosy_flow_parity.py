"""Golden parity: JAX CosyVoice flow vs the reference torch
CausalMaskedDiffWithXvec (encoder, estimator, and full CFM forward with
matched noise)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.codecs.cosyvoice_flow import (  # noqa: E402
    CosyFlowConfig, _encoder_forward, _estimator_forward, cosy_flow_forward,
    load_cosy_flow_params,
)

# the reference encoder hardcodes 512-dim lookahead/upsample layers, so the
# encoder keeps d=512 but with few blocks; the estimator shrinks fully
CFG = CosyFlowConfig(num_blocks=2, up_blocks=1, linear_units=128,
                     vocab_size=100, est_channels=32, est_head_dim=8,
                     est_heads=4, est_n_blocks=1, est_mid_blocks=2,
                     n_timesteps=2)


@pytest.fixture(scope="module")
def ref_flow():
    cf = import_reference("vox_serve.tokenizer.cosyvoice_flow")
    torch.manual_seed(0)
    enc = cf.UpsampleConformerEncoder(
        input_size=512, output_size=512, attention_heads=8,
        linear_units=CFG.linear_units, num_blocks=CFG.num_blocks,
        static_chunk_size=CFG.static_chunk_size)
    # trim up_encoders to CFG.up_blocks
    enc.up_encoders = torch.nn.ModuleList(list(enc.up_encoders)[:CFG.up_blocks])
    est = cf.CausalConditionalDecoder(
        in_channels=320, out_channels=80, channels=[CFG.est_channels],
        attention_head_dim=CFG.est_head_dim, n_blocks=CFG.est_n_blocks,
        num_mid_blocks=CFG.est_mid_blocks, num_heads=CFG.est_heads,
        static_chunk_size=CFG.est_static_chunk)
    cfm = cf.CausalConditionalCFM(in_channels=320, estimator=est)
    flow = cf.CausalMaskedDiffWithXvec(
        input_size=512, output_size=80, spk_embed_dim=CFG.spk_dim,
        vocab_size=CFG.vocab_size, encoder=enc, decoder=cfm)
    flow.eval()
    return flow, cf


@pytest.fixture(scope="module")
def mapped(ref_flow):
    flow, _ = ref_flow
    sd = {k: v.detach().numpy() for k, v in flow.state_dict().items()}
    return load_cosy_flow_params(sd, CFG)


def test_encoder_parity(ref_flow, mapped):
    flow, _ = ref_flow
    rng = np.random.default_rng(1)
    B, T = 2, 8
    xs = rng.normal(size=(B, T, 512)).astype(np.float32) * 0.3
    lens = torch.tensor([T, T])
    with torch.no_grad():
        ref, _ = flow.encoder(torch.from_numpy(xs), lens, streaming=True)
    ours = np.asarray(_encoder_forward(
        mapped, CFG, jnp.asarray(xs), jnp.ones((B, T), bool), streaming=True))
    assert ours.shape == tuple(ref.shape)
    rel = np.linalg.norm(ours - ref.numpy()) / np.linalg.norm(ref.numpy())
    assert rel < 1e-4, rel


def test_estimator_parity(ref_flow, mapped):
    flow, _ = ref_flow
    est = flow.decoder.estimator
    rng = np.random.default_rng(2)
    B, T = 2, 12
    x = rng.normal(size=(B, 80, T)).astype(np.float32)
    mu = rng.normal(size=(B, 80, T)).astype(np.float32)
    spks = rng.normal(size=(B, 80)).astype(np.float32)
    cond = rng.normal(size=(B, 80, T)).astype(np.float32)
    t = np.asarray([0.3, 0.3], np.float32)
    mask = np.ones((B, 1, T), np.float32)
    with torch.no_grad():
        ref = est(torch.from_numpy(x), torch.from_numpy(mask),
                  torch.from_numpy(mu), torch.from_numpy(t),
                  torch.from_numpy(spks), torch.from_numpy(cond),
                  streaming=True).numpy()
    ours = np.asarray(_estimator_forward(
        mapped["estimator"], CFG, jnp.asarray(x), jnp.asarray(mask),
        jnp.asarray(mu), jnp.asarray(t), jnp.asarray(spks),
        jnp.asarray(cond), streaming=True))
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1e-4, rel


def test_full_forward_parity_matched_noise(ref_flow, mapped, monkeypatch):
    flow, _ = ref_flow
    rng = np.random.default_rng(3)
    B, T = 1, 8
    tokens = rng.integers(0, CFG.vocab_size, size=(B, T))
    spk = rng.normal(size=(B, CFG.spk_dim)).astype(np.float32)
    noise = rng.normal(size=(1, 80, 2 * T)).astype(np.float32)

    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (1, 80, 2 * T):
            return torch.from_numpy(noise.copy())
        return real_randn(*shape, **kw)

    monkeypatch.setattr(torch, "randn", fixed_randn)
    with torch.no_grad():
        ref, _ = flow.forward(
            torch.from_numpy(tokens), torch.tensor([T] * B),
            torch.zeros(B, 0, 80), 0, torch.from_numpy(spk),
            streaming=True, finalize=True)
    # reference hardcodes n_timesteps=10 in forward; run ours at 10 too
    cfg10 = CosyFlowConfig(**{**CFG.__dict__, "n_timesteps": 10})
    ours = np.asarray(cosy_flow_forward(
        mapped, cfg10, jnp.asarray(tokens, jnp.int32),
        jnp.ones((B, T), bool), jnp.asarray(spk),
        jnp.zeros((B, 2 * T, 80)), jax.random.key(0), streaming=True,
        noise=jnp.asarray(noise)))
    ref = ref.numpy()
    assert ours.shape == ref.shape
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 5e-4, rel


def test_parameter_count_matches_reference(ref_flow, mapped):
    """VERDICT next-round #4 'Done' criterion: parameter-count match vs the
    reference state_dict."""
    flow, _ = ref_flow
    ref_n = sum(v.numel() for v in flow.state_dict().values())
    ours_n = sum(int(np.prod(leaf.shape))
                 for leaf in jax.tree.leaves(mapped))
    assert ours_n == ref_n, (ours_n, ref_n)
