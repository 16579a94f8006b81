"""GLM-4-Voice-9B speech-to-speech.

Behavioral parity with reference model/glm_voice.py:
  * GLM-4 9B backbone: 40 layers, hidden 4096, 32 q heads / 2 kv heads,
    partial rotary (rope over half the head dim), fused-gate MLP, qkv bias
  * audio input -> Whisper-VQ encoder tokens inlined into the chat template
    as <|audio_k|> strings (encoder gated on assets offline)
  * interleaved output: 13 text tokens then 26 audio tokens; audio tokens sit
    at ids >= audio_offset and only they reach the detokenizer (minus offset)
  * stop ids {151329, 151336, 151338}; top_p 0.8 T 0.8; interval 25/overlap 0
  * decoder: flow (token->mel) + HiFT, reusing the shared codec stack

This 9B model is the tensor-parallel candidate on v5e (SURVEY §7.2 item 7);
its params flow through parallel/sharding.py unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.glm_flow import (GLMFlowConfig, glm_flow_forward, init_glm_flow,
                               load_glm_flow_params)
from ..codecs.hifigan import (HiFTConfig, hift_decode, hift_decode_chunk,
                              init_hift, init_hift_cache, load_hift_params)
from ..models.backbone import BackboneConfig, init_backbone_params
from ..encoders.whisper_exact import (GLMVQConfig, glm_vq_encode,
                                      init_glm_vq_params, load_glm_vq_params,
                                      whisper_log_mel)
from ..models.base import BaseLM, PreprocessOutput
from ..utils import load_audio_mono
from ..models.sts_common import InterleavedAudioMixin
from ..sampling import SamplingConfig
from ..weights import load_text_tokenizer

STOP_IDS = (151329, 151336, 151338)
AUDIO_OFFSET = 151343  # convert_tokens_to_ids("<|audio_0|>") with real assets
AUDIO_VOCAB = 16384


class GLMVoiceLM(InterleavedAudioMixin, BaseLM):
    SAMPLE_RATE = 22050  # GLM HiFT vocoder rate (glm.py:2385)
    supports_audio_input = True
    stop_token_ids = STOP_IDS
    audio_offset = AUDIO_OFFSET

    def __init__(self, model_name: str = "zai-org/glm-4-voice-9b",
                 dtype=jnp.bfloat16, debug_backbone=None, debug_flow=None,
                 debug_hift=None, **_):
        super().__init__(model_name, dtype)
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=168960, hidden_size=4096, num_layers=40,
            num_heads=32, num_kv_heads=2, head_dim=128,
            intermediate_size=13696, qkv_bias=True,
            rope_theta=10000.0, rope_dim=64,  # partial rotary
            # ChatGLM rotates interleaved pairs (2i, 2i+1), not split halves
            # (reference glm_voice.py:148-155: interleave=True); split-half
            # on the raw checkpoint weights would rotate every q/k channel
            # against the wrong partner
            rope_interleaved=True,
            rms_eps=1.5625e-07, dtype=dtype,
        )
        self._flow_cfg = debug_flow or GLMFlowConfig(vocab_size=AUDIO_VOCAB)
        self._hift_cfg = debug_hift or HiFTConfig(
            sampling_rate=22050, upsample_rates=(8, 8),
            upsample_kernel_sizes=(16, 16),
            source_resblock_kernel_sizes=(7, 11))  # GLMHiFTModel dims
        self.text_tokenizer, self.assets_available = load_text_tokenizer(
            model_name, self._cfg.vocab_size)
        key = jax.random.key(51)
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
            "flow": self._load_codec("flow.pt", self._load_flow)
            or init_glm_flow(self._flow_cfg, ks[3]),
            "hift": self._load_codec("hift.pt", self._load_hift)
            or init_hift(self._hift_cfg, jax.random.fold_in(key, 9)),
        }
        self.sampling_config = self.default_sampling_config

    def _load_checkpoint(self) -> dict | None:
        """Map zai-org/glm-4-voice-9b (ChatGLM layout: transformer.encoder.*
        fused qkv / fused h_to_4h, transformer.embedding.word_embeddings,
        transformer.output_layer; reference load at glm_voice.py:318-323)."""
        from ..weights import (load_glm_backbone, load_safetensors_state,
                               resolve_model_dir)

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        try:
            state = load_safetensors_state(model_dir)
            cfg = self._cfg
            backbone = load_glm_backbone(
                state, cfg.num_layers, cfg.num_heads, cfg.num_kv_heads,
                cfg.resolved_head_dim, dtype=self.dtype)
            return {
                "backbone": backbone,
                "embed": jnp.asarray(
                    state["transformer.embedding.word_embeddings.weight"]
                ).astype(self.dtype),
                "head": jnp.asarray(
                    state["transformer.output_layer.weight"].T
                ).astype(self.dtype),
            }
        except Exception as e:
            from ..utils import get_logger

            get_logger("glm").warning(
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
        return 25

    @property
    def detokenize_overlap(self):
        return 0

    @property
    def max_tokens(self):
        return 2048

    #: the GLM decoder checkpoints live in their own repo
    #: (reference glm_voice.py:335-346)
    DECODER_REPO = "zai-org/glm-4-voice-decoder"

    def _load_codec(self, filename, mapper):
        from ..weights import resolve_model_dir

        if not isinstance(self._flow_cfg, GLMFlowConfig) or \
                self._flow_cfg != GLMFlowConfig(vocab_size=AUDIO_VOCAB):
            return None  # debug dims
        model_dir = resolve_model_dir(self.DECODER_REPO)
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

            get_logger("glm").warning(
                "%s mapping failed (%s); random init", filename,
                type(e).__name__)
            return None

    def _load_flow(self, sd):
        return load_glm_flow_params(sd, self._flow_cfg)

    def _load_hift(self, sd):
        return load_hift_params(
            {k.replace("generator.", ""): v for k, v in sd.items()},
            self._hift_cfg)

    @property
    def output_audio_length(self):
        # feat_len(interval) mel frames x 256 samples/frame at 22.05 kHz
        return self._flow_cfg.feat_len(self.detokenize_interval) * \
            self._hift_cfg.total_upsample

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def default_sampling_config(self):
        return SamplingConfig(top_p=0.8, temperature=0.8,
                              max_tokens=self.max_tokens)

    # ---- host-side ---------------------------------------------------------
    def preprocess(self, prompt=None, audio_path=None, **kwargs
                   ) -> PreprocessOutput:
        audio_str = ""
        if audio_path is not None:
            # Whisper-VQ the input speech into discrete tokens inlined as
            # <|audio_k|> strings in the chat template (reference
            # glm_voice.py:444-483, encoder/glm.py:217-369)
            toks = self._encode_audio_tokens(audio_path)
            audio_str = ("<|begin_of_audio|>"
                         + "".join(f"<|audio_{int(t)}|>" for t in toks)
                         + "<|end_of_audio|>")
        mode = "audio" if audio_path else "text"
        system = ("User will provide you with a "
                  f"{'speech' if mode == 'audio' else 'text'} instruction. "
                  "Do it step by step. First, think about the instruction "
                  "and respond in a interleaved manner, with 13 text token "
                  "followed by 26 audio tokens. ")
        user = audio_str if audio_path is not None else (prompt or "")
        text = (f"<|system|>\n{system}<|user|>\n{user}"
                "<|assistant|>streaming_transcription\n")
        if hasattr(self.text_tokenizer, "encode"):
            ids = list(self.text_tokenizer.encode(text))
        else:
            ids = list(self.text_tokenizer(text))
        return PreprocessOutput(
            input_tokens=np.asarray(ids, np.int32)[:, None])

    #: the Whisper-VQ speech tokenizer lives in its own repo
    #: (reference encoder/glm.py:330-344)
    ENCODER_REPO = "zai-org/glm-4-voice-tokenizer"

    def _encode_audio_tokens(self, audio_path) -> "np.ndarray":
        """WAV -> discrete speech tokens at 12.5 Hz through the
        weight-exact Whisper-VQ encoder (encoders/whisper_exact.py; the
        reference path is encoder/glm.py:281-327,346-369). Mel frames pad
        to the x8 token stride; tokens are trimmed back to the valid
        span."""
        wav = load_audio_mono(audio_path, 16000)
        mel = whisper_log_mel(wav, n_mels=self._enc_cfg.n_mels)
        valid = mel.shape[1]
        pad = (-valid) % 8
        if pad:
            mel = np.pad(mel, ((0, 0), (0, pad)))
        tokens = glm_vq_encode(self._enc_params, self._enc_cfg,
                               jnp.asarray(mel)[None],
                               valid_frames=(valid + 1) // 2)
        n_tokens = (valid + 7) // 8
        return np.asarray(tokens[0, :n_tokens], np.int32)

    @functools.cached_property
    def _enc_cfg(self):
        if self._cfg.hidden_size < 1024:  # debug dims
            return GLMVQConfig(n_mels=16, d_model=64, heads=4, ffn=128,
                               layers=2, block=8, vocab=16384,
                               max_positions=256)
        return GLMVQConfig()

    @functools.cached_property
    def _enc_params(self):
        from ..weights import load_safetensors_state, resolve_model_dir

        model_dir = (resolve_model_dir(self.ENCODER_REPO)
                     if self._cfg.hidden_size >= 1024 else None)
        if model_dir is not None:
            try:
                state = load_safetensors_state(model_dir)
                return load_glm_vq_params(state, self._enc_cfg)
            except Exception as e:
                from ..utils import get_logger

                get_logger("glm_voice").warning(
                    "Whisper-VQ mapping failed (%s); random init",
                    type(e).__name__)
        return init_glm_vq_params(jax.random.key(47), self._enc_cfg)

    # ---- traced ------------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        return jnp.take(params["embed"], token_ids[:, 0], axis=0)

    def logits(self, params, hidden):
        return (hidden @ params["head"])[:, None, :]

    # ---- codec -------------------------------------------------------------
    def detokenize(self, codec_params, token_ids, cache):
        """Each window decodes independently through the GLM flow (the
        reference GLMAudioDecoder.forward is stateless per chunk,
        glm.py:2640-2651); phase continuity across chunks comes from the
        streaming HiFT caches."""
        tokens = jnp.clip(token_ids[:, :, 0] - AUDIO_OFFSET, 0,
                          AUDIO_VOCAB - 1)
        B = tokens.shape[0]
        spk = jnp.zeros((B, self._flow_cfg.spk_dim))
        mel = glm_flow_forward(codec_params["flow"], self._flow_cfg, tokens,
                               spk, jax.random.key(0))
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
