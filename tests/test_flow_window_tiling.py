"""Flow-codec streaming windows must tile the token stream from 0.

The keep-last-step convention dropped tokens [0, overlap) of every stream
(~120 ms: usually the first phoneme) and emitted zero-lookahead tails at
every chunk boundary. The convention is now: windows [i*step, i*step+W)
emit the FIRST step tokens (the trailing overlap acts as real lookahead).
"""

import jax.numpy as jnp
import numpy as np

import vox_serve_tpu.models.flow_common as fc
from vox_serve_tpu.models.cosyvoice2 import CosyVoice2LM


def test_windows_tile_from_token_zero(monkeypatch):
    m = CosyVoice2LM.__new__(CosyVoice2LM)  # no weights needed
    cfg = CosyVoice2LM.__dict__.get("_flow_cfg", None)
    # use the real flow config object from a lightweight init path
    from vox_serve_tpu.codecs.cosyvoice_flow import CosyFlowConfig

    m._flow_cfg = CosyFlowConfig()
    m._hift_cfg = None

    r = m._flow_cfg.token_mel_ratio
    K = m.FLOW_CTX_TOKENS
    W = m.detokenize_interval
    step = W - m.detokenize_overlap

    def fake_flow(params, cfg_, tokens, valid, spk, conds, rng,
                  streaming=True, noise=None):
        # mel[:, 0, j] encodes the token id at input position j//r
        B, T = tokens.shape
        mel = jnp.repeat(tokens.astype(jnp.float32), r, axis=1)[:, None, :]
        return jnp.broadcast_to(mel, (B, cfg_.mel_dim, r * T))

    def fake_hift_chunk(params, hcfg, mel, cache, rng=None):
        return mel[:, 0, :], cache  # 1 "sample" per mel frame

    monkeypatch.setattr(fc, "cosy_flow_forward", fake_flow)
    monkeypatch.setattr(fc, "hift_decode_chunk", fake_hift_chunk)

    cache = {k: v for k, v in {
        "ctx_tokens": jnp.zeros((1, K), jnp.int32),
        "tok_pos": jnp.zeros((1,), jnp.int32),
        "spk": jnp.zeros((1, m._flow_cfg.spk_dim)),
        "prompt_feat": jnp.zeros((1, m.FLOW_PROMPT_FRAMES,
                                  m._flow_cfg.mel_dim)),
        "prompt_len": jnp.zeros((1,), jnp.int32),
        "hift": {},
    }.items()}
    codec_params = {"flow": {}, "hift": {}}

    # 3 windows over a strictly increasing token stream
    N = step * 2 + W
    stream = np.arange(1, N + 1, dtype=np.int32)
    out = []
    for i in range(3):
        win = stream[i * step: i * step + W]
        token_ids = jnp.asarray(win)[None, :, None]
        wav, cache = m.detokenize(codec_params, token_ids, cache)
        out.append(np.asarray(wav[0, 0]))
    emitted = np.concatenate(out)
    # every emitted frame maps back to the token id it encodes: the
    # concatenation must be tokens [0, 3*step) upsampled by r — starting at
    # token 0 with no gaps and no repeats
    expect = np.repeat(stream[: 3 * step], r).astype(np.float32)
    np.testing.assert_array_equal(emitted, expect)
