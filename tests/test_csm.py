"""CSM (small dims) worker e2e + Mimi codec streaming consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vox_serve_tpu.codecs.mimi import MimiConfig, init_mimi, mimi_decode_chunk, mimi_init_cache
from vox_serve_tpu.models.backbone import BackboneConfig
from vox_serve_tpu.models.csm import STOP_TOKEN, CSMLM
from vox_serve_tpu.models.depth import DepthConfig
from vox_serve_tpu.requests import Request
from vox_serve_tpu.worker import ModelWorker, WorkerConfig

SMALL_BACKBONE = BackboneConfig(
    vocab_size=2051, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128,
    rope_theta=5e5, llama31_rope_scaling=True, dtype=jnp.float32,
)
SMALL_DEPTH = DepthConfig(
    hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
    intermediate_size=64, max_seq=33, dtype=jnp.float32,
)
SMALL_MIMI = MimiConfig(
    n_codebooks=32, codebook_size=2048, vq_dim=8, num_filters=8,
    upsample_ratios=(4, 3), hidden_size=16, intermediate_size=32,
    head_dim=8, num_heads=2, num_kv_heads=2, num_layers=2, sliding_window=6,
)


def test_mimi_chunked_equals_full():
    params = init_mimi(SMALL_MIMI, jax.random.key(0))
    codes = jax.random.randint(jax.random.key(1), (2, 32, 8), 0, 2048)
    full, _ = mimi_decode_chunk(params, SMALL_MIMI, codes, None)
    assert full.shape == (2, 1, 8 * SMALL_MIMI.frame_samples)
    cache = mimi_init_cache(SMALL_MIMI, 2)
    outs = []
    for s in range(0, 8, 2):
        wav, cache = mimi_decode_chunk(params, SMALL_MIMI,
                                       codes[:, :, s:s + 2], cache)
        outs.append(np.asarray(wav))
    chunked = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(chunked, np.asarray(full), rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def model():
    return CSMLM(dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                 debug_depth=SMALL_DEPTH, debug_codec=SMALL_MIMI)


def test_prompt_masks(model):
    po = model.preprocess(prompt="hi", speaker=0)
    assert po.input_tokens.shape[1] == 33
    assert po.input_masks[:, -1].all()       # text channel on
    assert not po.input_masks[:, :-1].any()  # audio channels off


def test_stop_checks_last_audio_codebook(model):
    row = np.ones(33, np.int32)
    row[-2] = STOP_TOKEN
    assert model.is_stop(row)
    row[-2] = 5
    assert not model.is_stop(row)


def test_worker_end_to_end(model):
    wcfg = WorkerConfig(max_batch_size=2, num_pages=128, page_size=16,
                        prefill_token_buckets=(32,), max_prefill_requests=2,
                        warmup=False)
    worker = ModelWorker(model, wcfg)
    req = Request(request_id="csm1", prompt="hello")
    worker.run_lm_prefill([req])
    assert req.done_lm_prefill
    row = req.lm_output_tokens[0]
    assert row.shape == (33,)
    assert row[-1] == 0  # text channel zero
    assert np.all(row[:32] < 2051)
    while len(req.lm_output_audio_tokens) < 10 and not req.done_lm_generation:
        worker.run_lm_decode([req])
    if len(req.lm_output_audio_tokens) >= 10:
        req.next_audio_decode_idx = [0]
        worker.run_detokenize([req])
        pcm = req.output_audio.get_nowait()
        assert len(pcm) == model.output_audio_length * 2
    worker.free_kv_cache(req)


def test_audio_context_rows(tmp_path):
    """With encoder params present, audio context becomes Mimi-code rows with
    audio channels masked (reference csm.py:487-509), and the default
    2-speaker context prepends when prompt wavs exist (csm.py:511-568)."""
    import wave

    from vox_serve_tpu.codecs.mimi import init_mimi_encoder

    model = CSMLM(dtype=jnp.float32, debug_backbone=SMALL_BACKBONE,
                  debug_depth=SMALL_DEPTH, debug_codec=SMALL_MIMI)
    model._encoder_params = init_mimi_encoder(SMALL_MIMI, jax.random.key(3))

    def write_wav(path, n):
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            pcm = (np.sin(np.arange(n) * 0.03) * 8000).astype(np.int16)
            w.writeframes(pcm.tobytes())

    ref = tmp_path / "ref.wav"
    write_wav(ref, 2 * SMALL_MIMI.frame_samples)
    po = model.preprocess(prompt="hi", audio_path=str(ref), speaker=1)
    toks, masks = po.input_tokens, po.input_masks
    # trailing rows: audio frames (audio channels masked, text not) + EOS row
    assert masks[-1, 0] and not masks[-1, -1]
    assert np.all(toks[-1, :-1] == 0)  # EOS frame
    assert masks[-2, :-1].all()
    n_text = int(masks[:, -1].sum())
    assert n_text >= 1 and len(toks) > n_text

    # default context from a fake snapshot dir with prompt wavs
    (tmp_path / "prompts").mkdir()
    write_wav(tmp_path / "prompts" / "conversational_a.wav",
              2 * SMALL_MIMI.frame_samples)
    write_wav(tmp_path / "prompts" / "conversational_b.wav",
              2 * SMALL_MIMI.frame_samples)
    model._set_default_context(tmp_path)
    assert model._default_context is not None
    base_len = len(model.preprocess(prompt="hi").input_tokens)
    ctx_len = len(model._default_context[0])
    assert ctx_len > 4
    po2 = model.preprocess(prompt="hi")
    assert len(po2.input_tokens) == ctx_len + (base_len - ctx_len)
