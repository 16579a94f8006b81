"""CosyVoice2-0.5B TTS: Qwen2-0.5B backbone -> causal flow (token->mel) ->
HiFT vocoder.

Behavioral parity with reference model/cosyvoice2.py:
  * prompt = [sos] + ref_text + text + [task_id] + ref_speech_tokens, where
    every non-speech row is embedded host-side into input_features and masked
    so the forward replaces the token embedding with the feature row
    (cosyvoice2.py:924-1007; note the mask polarity: mask=True -> feature)
  * vocab = speech_token_size + 3 = 6564; stop ids {6561, 6562, 6563};
    sampling top_k 25, T 1.0; detokenize interval 28 / overlap 3, 24000
    samples (1 s) per chunk at 24 kHz
  * decoder = flow(tokens->mel, x2 upsample) + HiFT, with per-slot streaming
    caches (flow encoder KV + conv contexts)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.cosyvoice_flow import (CosyFlowConfig, init_cosy_flow,
                                     load_cosy_flow_params)
from ..codecs.hifigan import HiFTConfig, init_hift
from ..models.flow_common import CosyFlowDecodeMixin
from ..models.backbone import BackboneConfig, init_backbone_params
from ..encoders.mel import MelConfig, log_mel_spectrogram
from ..encoders.speaker import SpeakerEncoderConfig, init_speaker_encoder, speaker_embed
from ..models.base import BaseLM, PreprocessOutput
from ..utils import load_audio_mono
from ..sampling import SamplingConfig
from ..weights import (
    load_embedding, load_head, load_llama_family_backbone,
    load_safetensors_state, load_text_tokenizer, resolve_model_dir,
)

SPEECH_TOKEN_SIZE = 6561
SOS = 0
TASK_ID = 1
STOP_IDS = (SPEECH_TOKEN_SIZE, SPEECH_TOKEN_SIZE + 1, SPEECH_TOKEN_SIZE + 2)
MAX_REF_TOKENS = 150  # cap ICL prompt speech tokens (~6 s at 25 Hz)


class CosyVoice2LM(CosyFlowDecodeMixin, BaseLM):
    SAMPLE_RATE = 24000
    needs_input_features = True
    needs_input_masks = True
    supports_audio_input = True

    def __init__(self, model_name: str = "FunAudioLLM/CosyVoice2-0.5B",
                 dtype=jnp.bfloat16, debug_backbone=None, debug_flow=None,
                 debug_hift=None, **_):
        super().__init__(model_name, dtype)
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=151936, hidden_size=896, num_layers=24, num_heads=14,
            num_kv_heads=2, intermediate_size=4864, qkv_bias=True,
            rope_theta=1_000_000.0, dtype=dtype,
        )
        self._flow_cfg = debug_flow or CosyFlowConfig()
        self._hift_cfg = debug_hift or HiFTConfig()
        self.text_tokenizer, self.assets_available = load_text_tokenizer(
            model_name, self._cfg.vocab_size)
        self._init_params()
        self.sampling_config = self.default_sampling_config

    def _init_params(self):
        cfg = self._cfg
        key = jax.random.key(21)
        ks = jax.random.split(key, 8)
        H = cfg.hidden_size
        model_dir = resolve_model_dir(self.model_name)
        backbone = None
        if model_dir is not None:
            try:
                state = load_safetensors_state(model_dir)
                backbone = load_llama_family_backbone(
                    state, cfg.num_layers, qkv_bias=True, dtype=self.dtype)
                text_embed = load_embedding(
                    state, "model.embed_tokens.weight", self.dtype)
                # llm_decoder / speech_embedding / llm_embedding names follow
                # the reference checkpoint layout (cosyvoice2.py:289-291)
                speech_embed = load_embedding(
                    state, "speech_embedding.weight", self.dtype)
                llm_embed = load_embedding(state, "llm_embedding.weight",
                                           self.dtype)
                head = load_head(state, "llm_decoder.weight", dtype=self.dtype)
            except Exception:
                backbone = None
        if backbone is None:
            backbone = init_backbone_params(cfg, ks[0])
            text_embed = (jax.random.normal(ks[1], (cfg.vocab_size, H)) * 0.02
                          ).astype(self.dtype)
            speech_embed = (jax.random.normal(
                ks[2], (SPEECH_TOKEN_SIZE + 3, H)) * 0.02).astype(self.dtype)
            llm_embed = (jax.random.normal(ks[3], (2, H)) * 0.02
                         ).astype(self.dtype)
            head = (jax.random.normal(ks[4], (H, SPEECH_TOKEN_SIZE + 3)) * 0.02
                    ).astype(self.dtype)
            self.assets_available = False
        self.params = {
            "backbone": backbone,
            "text_embed": text_embed,
            "speech_embed": speech_embed,
            "llm_embed": llm_embed,
            "head": head,
        }
        self.codec_params = {
            "flow": self._load_flow_checkpoint(model_dir)
            or init_cosy_flow(self._flow_cfg, ks[5]),
            "hift": self._load_hift_checkpoint(model_dir)
            or init_hift(self._hift_cfg, ks[6]),
        }
        # default speaker reference (offline: neutral zero x-vector, no ICL)
        self.default_ref = {
            "ref_text_ids": np.zeros((0,), np.int32),
            "ref_speech_tokens": np.zeros((0,), np.int32),
            "spk": np.zeros((self._flow_cfg.spk_dim,), np.float32),
        }

    # ---- metadata ----------------------------------------------------------
    @property
    def backbone_config(self):
        return self._cfg

    @property
    def n_codebooks(self):
        return 1

    @property
    def vocab_size(self):
        return SPEECH_TOKEN_SIZE + 3

    @property
    def detokenize_interval(self):
        return 28

    @property
    def detokenize_overlap(self):
        return 3

    @property
    def max_tokens(self):
        return 4096

    @property
    def output_audio_length(self):
        # (interval - overlap) tokens x upsample x 480 samples / mel frame
        return (self.detokenize_interval - self.detokenize_overlap) * \
            self._flow_cfg.upsample * self._hift_cfg.total_upsample

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def default_sampling_config(self):
        return SamplingConfig(top_k=25, temperature=1.0,
                              max_tokens=self.max_tokens)

    # ---- host-side ---------------------------------------------------------
    def preprocess(self, prompt=None, audio_path=None, ref_text=None,
                   **kwargs) -> PreprocessOutput:
        text = prompt or ""
        if hasattr(self.text_tokenizer, "encode"):
            text_ids = list(self.text_tokenizer.encode(text))
        else:
            text_ids = list(self.text_tokenizer(text))
        ref = self.default_ref
        if audio_path is not None:
            # voice cloning: S3-tokenize the reference audio into prompt
            # speech tokens + CAMPPlus-style x-vector for the flow decoder
            # (reference model/cosyvoice2.py:360-373 via ONNX Runtime; here a
            # jitted JAX path, encoders/s3_exact.py)
            try:
                ref = dict(ref)
                toks, spk = self._encode_reference(audio_path)
                ref["ref_speech_tokens"] = toks
                ref["spk"] = spk
                if ref_text:
                    if hasattr(self.text_tokenizer, "encode"):
                        ref["ref_text_ids"] = np.asarray(
                            self.text_tokenizer.encode(ref_text), np.int32)
                    else:
                        ref["ref_text_ids"] = np.asarray(
                            self.text_tokenizer(ref_text), np.int32)
            except Exception:  # unreadable reference: neutral voice
                ref = self.default_ref
        ref_text = list(ref["ref_text_ids"])
        ref_speech = list(ref["ref_speech_tokens"])

        ids = [SOS] + ref_text + text_ids + [TASK_ID] + ref_speech
        T = len(ids)
        input_tokens = np.asarray(ids, np.int32)[:, None]
        # all prefill rows take their embedding from input_features
        input_masks = np.ones((T, 1), bool)
        H = self._cfg.hidden_size
        feats = np.zeros((T, H), np.float32)
        llm_embed, text_tbl, speech_tbl = self._host_embed_tables
        feats[0] = llm_embed[SOS]
        pos = 1
        tids = np.asarray(ref_text + text_ids, np.int64) % text_tbl.shape[0]
        feats[pos:pos + len(tids)] = text_tbl[tids]
        pos += len(tids)
        feats[pos] = llm_embed[TASK_ID]
        pos += 1
        sids = np.asarray(ref_speech, np.int64)
        feats[pos:pos + len(sids)] = speech_tbl[sids]
        pos += len(sids)
        # thread the x-vector into the flow decoder's per-slot cache
        dci = None
        if np.any(np.asarray(ref["spk"])):
            dci = self.make_flow_cache_row(
                spk=ref["spk"],
                prompt_tokens=np.asarray(ref["ref_speech_tokens"],
                                         np.int64).reshape(-1))
        return PreprocessOutput(input_tokens=input_tokens,
                                input_masks=input_masks,
                                input_features=feats,
                                decoder_cache_init=dci)

    def _encode_reference(self, audio_path):
        """Reference WAV -> (speech tokens (T',) int32 in [0, vocab),
        x-vector (spk_dim,) float32)."""
        wav = load_audio_mono(audio_path, 16000)
        # S3 v2 (FSMN attention + FSQ; reference runs
        # speech_tokenizer_v2.onnx, model/cosyvoice2.py:360-373):
        # weight-exact when assets are present, random-init otherwise —
        # one implementation either way (encoders/s3_exact.py)
        from ..encoders.s3_exact import s3v2_encode
        from ..encoders.whisper_exact import whisper_log_mel

        s3_params, s3_cfg = self._s3v2
        mel128 = whisper_log_mel(wav, n_mels=s3_cfg.n_mels)
        toks = np.asarray(
            s3v2_encode(s3_params, s3_cfg,
                        jnp.asarray(mel128)[None])[0], np.int32)
        toks = toks % SPEECH_TOKEN_SIZE  # no-op at the exact 3^8 vocab
        if self._campplus is not None:
            # weight-exact CAMPPlus x-vector (reference runs campplus.onnx,
            # model/cosyvoice2.py:360-373); reuse the already-loaded wav
            from ..encoders.campplus import campplus_embed, kaldi_fbank

            feat = kaldi_fbank(wav)
            spk = campplus_embed(self._campplus, jnp.asarray(feat)[None])[0]
        else:
            # dev fallback x-vector
            mel_cfg = MelConfig(sample_rate=16000,
                                n_mels=self._spk_cfg_.n_mels)
            mel = log_mel_spectrogram(jnp.asarray(wav)[None], mel_cfg)
            spk = speaker_embed(self._spk_params, self._spk_cfg_, mel)[0]
        return toks[:MAX_REF_TOKENS], np.asarray(spk, np.float32)

    @functools.cached_property
    def _host_embed_tables(self):
        """One-time host copies of the immutable embedding tables: the
        per-token device gathers in preprocess cost hundreds of sequential
        D2H round-trips per request."""
        return (np.asarray(self.params["llm_embed"], np.float32),
                np.asarray(self.params["text_embed"], np.float32),
                np.asarray(self.params["speech_embed"], np.float32))

    @functools.cached_property
    def _s3v2(self):
        """S3 v2 params + config: weight-exact when tensors are extractable
        (ONNX initializers from speech_tokenizer_v2.onnx via onnx_reader, or
        a torch-format conversion in the model dir); otherwise an explicit
        random-init dev fallback of the SAME implementation at a small
        config — one S3 source of truth (encoders/s3_exact.py)."""
        from ..encoders.s3_exact import (S3V2Config, init_s3v2_params,
                                         load_s3v2_params)
        from ..weights import resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        cfg = S3V2Config()
        for loader, path in (() if model_dir is None else (
                ("onnx", model_dir / "speech_tokenizer_v2.onnx"),
                ("st", model_dir / "speech_tokenizer_v2.safetensors"),
                ("pt", model_dir / "speech_tokenizer_v2.pt"))):
            if not path.exists():
                continue
            try:
                if loader == "onnx":
                    from ..onnx_reader import load_onnx_initializers

                    sd = load_onnx_initializers(path)
                elif loader == "st":
                    from ..weights import load_safetensors_file

                    sd = load_safetensors_file(path)
                else:
                    import torch

                    sd = {k: v.numpy() for k, v in torch.load(
                        path, map_location="cpu",
                        weights_only=True).items()}
                return load_s3v2_params(sd, cfg), cfg
            except Exception as e:
                from ..utils import get_logger

                get_logger("cosyvoice2").warning(
                    "S3 v2 mapping from %s failed (%s)", path.name,
                    type(e).__name__)
        dev_cfg = S3V2Config(n_state=256, heads=4, layers=2)
        return init_s3v2_params(jax.random.key(29), dev_cfg), dev_cfg

    @functools.cached_property
    def _spk_cfg_(self):
        return SpeakerEncoderConfig(n_mels=80,
                                    out_dim=self._flow_cfg.spk_dim)

    @functools.cached_property
    def _campplus(self):
        """Weight-exact CAMPPlus when a torch-format checkpoint is present
        (the published campplus.onnx needs tensor extraction; a converted
        campplus.safetensors / campplus.pt in the model dir is used
        directly)."""
        from ..weights import resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        try:
            from ..encoders.campplus import load_campplus_params

            if (model_dir / "campplus.safetensors").exists():
                from ..weights import load_safetensors_file

                return load_campplus_params(
                    load_safetensors_file(model_dir / "campplus.safetensors"))
            if (model_dir / "campplus.pt").exists():
                import torch

                sd = torch.load(model_dir / "campplus.pt",
                                map_location="cpu", weights_only=True)
                return load_campplus_params(
                    {k: v.numpy() for k, v in sd.items()})
            if (model_dir / "campplus.onnx").exists():
                # extract the initializer tensors straight from the ONNX
                # protobuf (onnx_reader); torch exports keep param names
                from ..onnx_reader import load_onnx_initializers

                return load_campplus_params(
                    load_onnx_initializers(model_dir / "campplus.onnx"))
        except Exception as e:
            from ..utils import get_logger

            get_logger("cosyvoice2").warning(
                "campplus mapping failed (%s)", type(e).__name__)
        return None

    @functools.cached_property
    def _spk_params(self):
        return init_speaker_encoder(self._spk_cfg_, jax.random.key(31))

    def is_stop(self, token_ids: np.ndarray) -> bool:
        return int(token_ids[0]) in STOP_IDS

    # ---- traced ------------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        ids = jnp.clip(token_ids[:, 0], 0, SPEECH_TOKEN_SIZE + 2)
        speech = jnp.take(params["speech_embed"], ids, axis=0)
        if masks is None or features is None:
            return speech
        return jnp.where(masks[:, :1], features.astype(speech.dtype), speech)

    def logits(self, params, hidden):
        return (hidden @ params["head"])[:, None, :]

    # ---- codec -------------------------------------------------------------
    # detokenize / init_decoder_cache come from CosyFlowDecodeMixin: the
    # weight-exact CosyVoice flow (codecs/cosyvoice_flow.py) + streaming HiFT
    # with left-context recompute (models/flow_common.py)

    def _load_flow_checkpoint(self, model_dir):
        """Map flow.pt from the local snapshot (reference cosyvoice2.py
        downloads flow.pt/hift.pt alongside the LLM checkpoint)."""
        if model_dir is None:
            return None
        path = model_dir / "flow.pt"
        if not path.exists():
            return None
        try:
            import torch

            sd = {k: v.numpy() for k, v in torch.load(
                str(path), map_location="cpu", weights_only=True).items()}
            return load_cosy_flow_params(sd, self._flow_cfg)
        except Exception as e:
            from ..utils import get_logger

            get_logger("cosyvoice2").warning(
                "flow checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    def _load_hift_checkpoint(self, model_dir):
        """Map hift.pt (reference cosyvoice2.py:802-855: keys carry a
        ``generator.`` prefix that is stripped before the strict load)."""
        if model_dir is None:
            return None
        path = model_dir / "hift.pt"
        if not path.exists():
            return None
        try:
            import torch

            from ..codecs.hifigan import load_hift_params

            sd = {k.replace("generator.", ""): v.numpy()
                  for k, v in torch.load(str(path), map_location="cpu",
                                         weights_only=True).items()}
            return load_hift_params(sd, self._hift_cfg)
        except Exception as e:
            from ..utils import get_logger

            get_logger("cosyvoice2").warning(
                "hift checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None
