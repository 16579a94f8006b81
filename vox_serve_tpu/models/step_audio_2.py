"""Step-Audio-2-mini speech-to-speech.

Behavioral parity with reference model/step_audio_2.py:
  * Qwen2.5-7B-style backbone (hidden 3584, 28 layers, 28/4 heads, qkv bias,
    theta 1e6, vocab 158720)
  * audio input: Whisper-like mel encoder + 2x conv adaptor, features spliced
    into prefill embeddings at the <audio> marker 151688 (encoder gated on
    assets; splice positions carried via input_features/input_masks)
  * interleaved text/audio output filtered by audio_offset; stop on eos
  * sampling top_p 0.9 T 0.7 repetition 1.05 global; interval 28 / overlap 3
  * decoder: CFM (DiT estimator in the reference; shared causal-flow stack
    here) + HiFT
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.step_dit import (StepFlowConfig, init_step_flow,
                               load_step_flow_params, step_flow_forward)
from ..codecs.hifigan import (HiFTConfig, hift_decode, hift_decode_chunk,
                              init_hift, init_hift_cache, load_hift_params)
from ..models.backbone import BackboneConfig, init_backbone_params
from ..encoders.whisper_exact import (StepEncConfig,
                                      init_step_encoder_params,
                                      load_step_encoder_params, step_adaptor,
                                      step_encode, whisper_log_mel)
from ..models.base import BaseLM, PreprocessOutput
from ..utils import load_audio_mono
from ..models.sts_common import InterleavedAudioMixin
from ..sampling import SamplingConfig
from ..weights import load_text_tokenizer

AUDIO_MARKER = 151688
AUDIO_OFFSET = 151696
AUDIO_VOCAB = 6656
STOP_IDS = (151643, 151645)


class StepAudio2LM(InterleavedAudioMixin, BaseLM):
    SAMPLE_RATE = 24000
    supports_audio_input = True
    needs_input_features = True
    needs_input_masks = True
    stop_token_ids = STOP_IDS
    audio_offset = AUDIO_OFFSET

    def __init__(self, model_name: str = "stepfun-ai/Step-Audio-2-mini",
                 dtype=jnp.bfloat16, debug_backbone=None, debug_flow=None,
                 debug_hift=None, **_):
        super().__init__(model_name, dtype)
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=158720, hidden_size=3584, num_layers=28,
            num_heads=28, num_kv_heads=4, intermediate_size=18944,
            qkv_bias=True, rope_theta=1_000_000.0, dtype=dtype,
        )
        self._flow_cfg = debug_flow or StepFlowConfig(vocab_size=AUDIO_VOCAB)
        self._hift_cfg = debug_hift or HiFTConfig()
        self.text_tokenizer, self.assets_available = load_text_tokenizer(
            model_name, self._cfg.vocab_size)
        key = jax.random.key(61)
        ks = jax.random.split(key, 4)
        H = self._cfg.hidden_size
        loaded = None if debug_backbone is not None else self._load_checkpoint()
        if loaded is not None:
            self.params = loaded
        else:
            if debug_backbone is None:
                self.assets_available = False
            self.params = {
                "backbone": init_backbone_params(self._cfg, ks[0]),
                "embed": (jax.random.normal(ks[1], (self._cfg.vocab_size, H))
                          * 0.02).astype(dtype),
                "head": (jax.random.normal(ks[2], (H, self._cfg.vocab_size))
                         * 0.02).astype(dtype),
            }
        self.codec_params = {
            "flow": self._load_codec("token2wav/flow.pt", self._load_flow)
            or init_step_flow(self._flow_cfg, ks[3]),
            "hift": self._load_codec("token2wav/hift.pt", self._load_hift)
            or init_hift(self._hift_cfg, jax.random.fold_in(key, 9)),
        }
        self.sampling_config = self.default_sampling_config

    def _load_checkpoint(self) -> dict | None:
        """Map stepfun-ai/Step-Audio-2-mini (Qwen2.5-style: model.layers.*
        with qkv bias, model.embed_tokens, lm_head; reference load at
        model/step_audio_2.py:306-308)."""
        from ..weights import (load_llama_family_backbone,
                               load_safetensors_state, resolve_model_dir)

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        try:
            state = load_safetensors_state(model_dir)
            backbone = load_llama_family_backbone(
                state, self._cfg.num_layers, prefix="model.",
                qkv_bias=True, dtype=self.dtype)
            embed = jnp.asarray(
                state["model.embed_tokens.weight"]).astype(self.dtype)
            head_name = ("lm_head.weight" if "lm_head.weight" in state
                         else "model.embed_tokens.weight")
            try:
                # audio encoder + adaptor live in the same checkpoint under
                # encoder.* / adapter.* (reference model/step_audio_2.py:
                # 244-260)
                self._enc_loaded = load_step_encoder_params(
                    state, self._enc_cfg)
            except Exception as enc_e:
                from ..utils import get_logger

                get_logger("step_audio_2").warning(
                    "audio encoder mapping failed (%s); random init",
                    type(enc_e).__name__)
            return {
                "backbone": backbone,
                "embed": embed,
                "head": jnp.asarray(state[head_name].T).astype(self.dtype),
            }
        except Exception as e:
            from ..utils import get_logger

            get_logger("step_audio_2").warning(
                "checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    @property
    def backbone_config(self):
        return self._cfg

    @property
    def n_codebooks(self):
        return 1

    @property
    def vocab_size(self):
        return self._cfg.vocab_size

    @property
    def detokenize_interval(self):
        return 28

    @property
    def detokenize_overlap(self):
        return 3

    @property
    def max_tokens(self):
        return 2048

    @property
    def output_audio_length(self):
        return (self.detokenize_interval - self.detokenize_overlap) * \
            self._flow_cfg.upsample * self._hift_cfg.total_upsample

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def default_sampling_config(self):
        return SamplingConfig(top_p=0.9, temperature=0.7,
                              repetition_penalty=1.05, repetition_window=-1,
                              max_tokens=self.max_tokens)

    # ---- host-side ---------------------------------------------------------
    def preprocess(self, prompt=None, audio_path=None, **kwargs
                   ) -> PreprocessOutput:
        """Single-turn Step-Audio-2 chat layout (reference
        step_audio_2.py:538-573 + _apply_chat_template:503-530):
        ``<|BOT|>system\\n...<|EOT|><|BOT|>human\\n{content}<|EOT|>
        <|BOT|>assistant\\n<tts_start>`` where audio content is
        ``<audio_start><audio_patch>*Ta<audio_end>`` INSIDE the human turn
        and the encoder+adaptor features are spliced over the patch rows
        (step_audio_2.py:601-610). The previous im_start template put the
        audio before any role turn — a layout the model never saw."""

        def enc_text(t):
            if hasattr(self.text_tokenizer, "encode"):
                return list(self.text_tokenizer.encode(t))
            return list(self.text_tokenizer(t))

        pre = enc_text("<|BOT|>system\nYou are a helpful assistant."
                       "<|EOT|><|BOT|>human\n")
        post = enc_text("<|EOT|><|BOT|>assistant\n<tts_start>")
        enc = None
        if audio_path is not None:
            # whisper-style mel encoder (25 Hz -> 12.5 Hz pooled) + 2x conv
            # adaptor (encoders/whisper_exact.py)
            enc = self._encode_audio(audio_path)  # (T_a, H)
            mid = (enc_text("<audio_start>")
                   + [AUDIO_MARKER] * enc.shape[0]
                   + enc_text("<audio_end>"))
        else:
            mid = enc_text(prompt or "")
        ids = pre + mid + post
        T = len(ids)
        toks = np.asarray(ids, np.int32)[:, None]
        masks = np.zeros((T, 1), bool)
        feats = np.zeros((T, self._cfg.hidden_size), np.float32)
        if enc is not None:
            rows = np.nonzero(toks[:, 0] == AUDIO_MARKER)[0][: enc.shape[0]]
            feats[rows] = enc[: len(rows)]
            masks[rows] = True
        return PreprocessOutput(input_tokens=toks, input_masks=masks,
                                input_features=feats)

    def _encode_audio(self, audio_path) -> np.ndarray:
        """WAV -> (T_a, llm_dim) adaptor features for prefill splicing
        (weight-exact encoder + adaptor, encoders/whisper_exact.py; the
        reference path is encoder/step_audio_2.py:210-225 ->
        model/step_audio_2.py:218-243)."""
        wav = load_audio_mono(audio_path, 16000)
        mel = whisper_log_mel(wav, n_mels=self._enc_cfg.n_mels, padding=479)
        feats = step_encode(self._enc_params, self._enc_cfg,
                            jnp.asarray(mel)[None],
                            valid_frames=mel.shape[1])
        out = step_adaptor(self._enc_params, self._enc_cfg, feats)[0]
        return np.asarray(out, np.float32)

    _enc_loaded = None

    @functools.cached_property
    def _enc_cfg(self):
        if self._cfg.hidden_size < 1024:  # debug dims
            return StepEncConfig(n_mels=16, d_model=64, heads=4, layers=2,
                                 llm_dim=self._cfg.hidden_size,
                                 adapter_hidden=32)
        # published audio_encoder_config (whisper-large-v3-shaped)
        return StepEncConfig(llm_dim=self._cfg.hidden_size)

    @functools.cached_property
    def _enc_params(self):
        return self._enc_loaded or init_step_encoder_params(
            jax.random.key(41), self._enc_cfg)

    # ---- traced ------------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        x = jnp.take(params["embed"], token_ids[:, 0], axis=0)
        if masks is not None and features is not None:
            # splice encoder features over <audio> marker rows
            x = jnp.where(masks[:, :1], features.astype(x.dtype), x)
        return x

    def logits(self, params, hidden):
        return (hidden @ params["head"])[:, None, :]

    # ---- codec -------------------------------------------------------------
    def _load_codec(self, filename, mapper):
        """token2wav/{flow,hift}.pt ship inside the main snapshot
        (reference step_audio_2.py:1810-1830)."""
        from ..weights import resolve_model_dir

        if self._flow_cfg != StepFlowConfig(vocab_size=AUDIO_VOCAB):
            return None  # debug dims
        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None or not (model_dir / filename).exists():
            return None
        try:
            import torch

            sd = {k: v.numpy() for k, v in torch.load(
                str(model_dir / filename), map_location="cpu",
                weights_only=True).items()}
            return mapper(sd)
        except Exception as e:
            from ..utils import get_logger

            get_logger("step_audio_2").warning(
                "%s mapping failed (%s); random init", filename,
                type(e).__name__)
            return None

    def _load_flow(self, sd):
        return load_step_flow_params(sd, self._flow_cfg)

    def _load_hift(self, sd):
        return load_hift_params(
            {k.replace("generator.", ""): v for k, v in sd.items()},
            self._hift_cfg)

    def detokenize(self, codec_params, token_ids, cache):
        """Window layout: the last `overlap` tokens are the DiT flow's
        pre-lookahead context (Step's inference_chunk semantics,
        step_audio_2.py:1731-1804); emitted mel covers the first
        (T - overlap) tokens, which tiles contiguously across windows."""
        tokens = jnp.clip(token_ids[:, :, 0] - AUDIO_OFFSET, 0,
                          AUDIO_VOCAB - 1)
        B, T = tokens.shape
        spk = jnp.zeros((B, self._flow_cfg.spk_dim))
        conds = jnp.zeros(
            (B, 2 * (T - self.detokenize_overlap), self._flow_cfg.mel_dim))
        mel = step_flow_forward(
            codec_params["flow"], self._flow_cfg, tokens,
            jnp.ones((B, T), bool), spk, conds, jax.random.key(0),
            context=self.detokenize_overlap)
        if cache is not None:
            wav, new_hift = hift_decode_chunk(
                codec_params["hift"], self._hift_cfg, mel, cache["hift"])
            new_cache = {"hift": new_hift}
        else:
            wav, _ = hift_decode(codec_params["hift"], self._hift_cfg, mel)
            new_cache = None
        return wav[:, None, :], new_cache

    def init_decoder_cache(self, batch):
        return {"hift": init_hift_cache(self._hift_cfg, batch)}
