"""Golden parity: weight-exact S3 tokenizer v2 (FSMN attention + FSQ) vs the
reference torch S3TokenizerV2 at reduced dims."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_compat import import_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vox_serve_tpu.encoders.s3_exact import (  # noqa: E402
    S3V2Config, init_s3v2_params, load_s3v2_params, s3v2_encode,
)

CFG = S3V2Config(n_mels=16, n_state=64, heads=4, layers=2, rope_dim=16)


@pytest.fixture(scope="module")
def ref():
    s3 = import_reference("vox_serve.tokenizer.s3")
    mc = s3.ModelConfig(n_mels=16, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2)
    torch.manual_seed(0)
    m = s3.S3TokenizerV2("tiny_v2", mc, init_from_onnx=False)
    # rope table dim must match head_dim for the reduced config
    m.encoder.freqs_cis = s3.precompute_freqs_cis(16, 2048)
    m.eval()
    return s3, m


def test_s3v2_token_parity(ref):
    s3, m = ref
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = load_s3v2_params(sd, CFG)

    rng = np.random.default_rng(1)
    T_mel = 96  # -> 24 tokens
    mel = rng.standard_normal((1, 16, T_mel)).astype(np.float32)
    with torch.no_grad():
        ref_tokens, ref_len = m.quantize(
            torch.from_numpy(mel), torch.tensor([T_mel]))
    ours = np.asarray(s3v2_encode(params, CFG, jnp.asarray(mel)))
    n = int(ref_len[0])
    np.testing.assert_array_equal(ours[0, :n], ref_tokens[0, :n].numpy())


def test_s3v2_random_init_shapes():
    import jax

    params = init_s3v2_params(jax.random.key(0), CFG)
    mel = jnp.zeros((2, 16, 64))
    toks = s3v2_encode(params, CFG, mel)
    assert toks.shape == (2, 16)
    assert int(toks.max()) < CFG.vocab_size
