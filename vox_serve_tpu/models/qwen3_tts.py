"""Qwen3-TTS (12Hz, 0.6B/1.7B × CustomVoice/Base/VoiceDesign) — the flagship.

Talker transformer with dual-channel tokens (16 audio codebooks + 1 text
channel, reference model/qwen3_tts.py:1834-1852) + a 5-layer MTP "code
predictor" depth transformer. TPU-first: the 15-step depth codebook loop is a
single lax.scan inside the jitted step (vs 15 CUDA-graph replays,
cuda_graph_worker.py:1058-1160), with per-iteration head/embedding selection
by jnp.take over stacked weights (the tensorized analogue of
qwen3_tts.py:936-942).

Behavioral parity:
  * prompt construction for custom-voice / voice-design / base(clone) modes
    incl. input-streaming variants (qwen3_tts.py:1373-1803): role tokens,
    codec think-prefix with language id, speaker token/embedding, text tokens
    over codec_pad, tts_eos, tts_pad+codec_bos, ICL ref codes with presummed
    codebook embeddings in input_features
  * forward embedding merge: text_projection(text_embedding(col -1)) +
    codec_embedding(col 0) gated by mask, + input_features
  * suppress tokens [vocab-1024, vocab) except codec EOS 2150
  * sampling defaults top_k 50, top_p 1.0, T 0.9, repetition 1.05 global
  * depth feedback: Σ codebook embeddings accumulate into next step's
    input_features (per-slot device feedback buffer)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.qwen3_codec import (
    Qwen3CodecConfig, init_qwen3_codec, qwen3_codec_decode_chunk,
    qwen3_codec_init_cache,
)
from ..models.backbone import BackboneConfig, init_backbone_params, linear, _init_linear
from ..models.base import BaseLMWithDepth, PreprocessOutput
from ..models.depth import (
    DepthConfig, depth_forward, init_depth_kv, init_depth_params,
    prepare_depth_layers,
)
from ..sampling import SamplingConfig, sample
from ..weights import load_text_tokenizer

# special token ids (reference qwen3_tts.py:210-263)
TTS_BOS = 151672
TTS_EOS = 151673
TTS_PAD = 151671
CODEC_BOS = 2149
CODEC_EOS = 2150
CODEC_PAD = 2148
CODEC_THINK = 2154
CODEC_NOTHINK = 2155
CODEC_THINK_BOS = 2156
CODEC_THINK_EOS = 2157
LANGUAGE_IDS = {
    "chinese": 2055, "english": 2050, "german": 2053, "italian": 2070,
    "portuguese": 2071, "spanish": 2054, "japanese": 2058, "korean": 2064,
    "french": 2061, "russian": 2069,
}
TEXT_VOCAB = 151936
SAMPLES_PER_FRAME = 1920


class Qwen3TTSLM(BaseLMWithDepth):
    SAMPLE_RATE = 24000
    needs_input_features = True
    needs_input_masks = True
    supports_input_streaming = True
    supports_chained_detok = True  # sampled rows are audio-token rows
    text_channel_index = -1

    def __init__(self, model_name: str = "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
                 dtype=jnp.bfloat16, detokenize_interval=None,
                 debug_backbone=None, debug_depth=None, debug_codec=None, **_):
        super().__init__(model_name, dtype)
        name = model_name.lower()
        self.tts_model_type = ("base" if "base" in name else
                               "voice_design" if "voicedesign" in name or
                               "voice-design" in name else "custom_voice")
        self.tts_model_size = "0b6" if "0.6b" in name else "1b7"
        scale = 1.0 if self.tts_model_size == "1b7" else 0.5

        self._is_debug_config = any(
            x is not None for x in (debug_backbone, debug_depth, debug_codec))
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=3072, hidden_size=2048, num_layers=28, num_heads=16,
            num_kv_heads=8, head_dim=128, intermediate_size=6144,
            qk_norm=True, rope_theta=1_000_000.0, dtype=dtype,
        )
        self._depth_cfg = debug_depth or DepthConfig(
            hidden_size=1024, num_layers=5, num_heads=16, num_kv_heads=8,
            head_dim=128, intermediate_size=3072, max_seq=17, qk_norm=True,
            rope_theta=1_000_000.0, dtype=dtype,
        )
        self._codec_cfg = debug_codec or Qwen3CodecConfig()
        self._detok_interval = detokenize_interval or 10
        self.depth_vocab_size = 2048
        self.num_code_groups = 16
        from ..utils import get_logger

        self.logger = get_logger("qwen3_tts")
        self.spk_ids = {"ryan": 2090, "vivian": 2091, "serena": 2092}
        self.spk_dialects: dict = {}  # speaker -> dialect language name
        self._load_talker_tables()
        self.text_tokenizer, self.assets_available = load_text_tokenizer(
            model_name, TEXT_VOCAB)
        self._init_params()
        self.sampling_config = self.default_sampling_config
        # suppress [vocab-1024, vocab) except codec EOS
        mask = np.zeros((self._cfg.vocab_size,), np.float32)
        lo = self._cfg.vocab_size - 1024
        mask[lo:] = float(np.finfo(np.float32).min)
        mask[CODEC_EOS] = 0.0
        self._suppress_bias = jnp.asarray(mask)

    @property
    def feedback_dim(self):
        return self._cfg.hidden_size

    def _load_talker_tables(self) -> None:
        """Speaker-id and dialect tables from the checkpoint's config.json
        (reference talker_config.spk_id / spk_is_dialect) — the hardcoded
        trio only covers the documented default speakers."""
        import json as _json

        from ..weights import resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return
        cfg_path = model_dir / "config.json"
        try:
            raw = _json.loads(cfg_path.read_text())
        except OSError:
            return
        except Exception:
            return
        talker = raw.get("talker_config", {}) or {}
        spk = talker.get("spk_id") or {}
        if isinstance(spk, dict) and spk:
            self.spk_ids = {str(k).lower(): int(v) for k, v in spk.items()}
        dial = talker.get("spk_is_dialect") or {}
        if isinstance(dial, dict):
            self.spk_dialects = {str(k).lower(): v for k, v in dial.items()
                                 if v}

    def _load_checkpoint(self) -> dict | None:
        """Map the HF checkpoint layout (reference qwen3_tts.py:707-894:
        talker.model.* / talker.code_predictor.*) into our pytree."""
        from ..weights import (
            load_llama_family_backbone, load_safetensors_state,
            resolve_model_dir,
        )

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        try:
            state = load_safetensors_state(model_dir)
            cfg, dcfg = self._cfg, self._depth_cfg
            t = "talker.model."
            cp = "talker.code_predictor."
            backbone = load_llama_family_backbone(
                state, cfg.num_layers, prefix=t, qk_norm=True,
                dtype=self.dtype)
            depth_backbone = load_llama_family_backbone(
                state, dcfg.num_layers, prefix=cp + "model.", qk_norm=True,
                dtype=self.dtype)
            as_j = lambda n: jnp.asarray(state[n]).astype(self.dtype)
            n_cp = self.num_code_groups - 1
            # Base variant ships the ECAPA speaker encoder in the same
            # checkpoint under speaker_encoder.* (mel_dim 128, reference
            # qwen3_tts.py:282-285,835-891)
            if any(k.startswith("speaker_encoder.") for k in state):
                from ..encoders.ecapa import EcapaConfig, load_ecapa_params

                self._spk_enc_cfg = EcapaConfig(
                    mel_dim=128, enc_dim=self._cfg.hidden_size)
                self._spk_enc_params = load_ecapa_params(
                    state, self._spk_enc_cfg)
            return {
                "backbone": backbone,
                "codec_embedding": as_j(t + "codec_embedding.weight"),
                "text_embedding": as_j(t + "text_embedding.weight"),
                "text_projection": {
                    "fc1": {"w": as_j("talker.text_projection.linear_fc1.weight").T,
                            "b": as_j("talker.text_projection.linear_fc1.bias")},
                    "fc2": {"w": as_j("talker.text_projection.linear_fc2.weight").T,
                            "b": as_j("talker.text_projection.linear_fc2.bias")},
                },
                "codec_head": as_j("talker.codec_head.weight").T,
                "depth": {
                    "backbone": depth_backbone,
                    "proj": {
                        "w": as_j(cp + "small_to_mtp_projection.weight").T,
                        "b": as_j(cp + "small_to_mtp_projection.bias"),
                    },
                    "embeds": jnp.stack([
                        as_j(cp + f"model.codec_embedding.{i}.weight")
                        for i in range(n_cp)]),
                    "heads": jnp.stack([
                        as_j(cp + f"lm_head.{i}.weight").T
                        for i in range(n_cp)]),
                },
            }
        except Exception as e:
            from ..utils import get_logger

            get_logger("qwen3").warning(
                "checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    #: the codec decoder ships as its own HF repo (reference
    #: qwen3_codec.py:1800: Qwen/Qwen3-TTS-Tokenizer-12Hz)
    CODEC_REPO = "Qwen/Qwen3-TTS-Tokenizer-12Hz"

    def _load_codec_params(self) -> dict | None:
        """Load the real codec decoder weights (reference load site:
        tokenizer/qwen3_codec.py:1816-1843). Mapping golden-tested against
        the reference torch decoder in tests/test_qwen3_codec_parity.py."""
        from ..codecs.qwen3_codec import load_qwen3_codec_params
        from ..weights import load_safetensors_state, resolve_model_dir

        model_dir = resolve_model_dir(self.CODEC_REPO)
        if model_dir is None:
            return None
        try:
            state = load_safetensors_state(model_dir)
            self._load_codec_encoder(state)
            return load_qwen3_codec_params(state, self._codec_cfg)
        except Exception as e:
            from ..utils import get_logger

            get_logger("qwen3").warning(
                "codec checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    def _init_codec_params(self):
        # real weights only map onto the real architecture, not debug dims
        codec = (self._load_codec_params()
                 if self._codec_cfg == Qwen3CodecConfig() else None)
        self.codec_assets_available = codec is not None
        self.codec_params = codec if codec is not None else init_qwen3_codec(
            self._codec_cfg, jax.random.key(12))

    def _init_params(self):
        # real weights only map onto the real architecture (same guard as
        # the other families, e.g. glm_voice.py): under debug_* configs a
        # cached checkpoint would shape-mismatch at first trace
        loaded = None if self._is_debug_config else self._load_checkpoint()
        if loaded is not None:
            self.params = loaded
            self._init_codec_params()
            return
        self.assets_available = False
        cfg, dcfg = self._cfg, self._depth_cfg
        key = jax.random.key(11)
        ks = jax.random.split(key, 10)
        H = cfg.hidden_size
        self.params = {
            "backbone": init_backbone_params(cfg, ks[0]),
            "codec_embedding": (jax.random.normal(ks[1], (cfg.vocab_size, H))
                                * 0.02).astype(self.dtype),
            "text_embedding": (jax.random.normal(ks[2], (TEXT_VOCAB, H))
                               * 0.02).astype(self.dtype),
            "text_projection": {
                "fc1": _init_linear(ks[3], H, H, self.dtype, bias=True),
                "fc2": _init_linear(ks[4], H, H, self.dtype, bias=True),
            },
            "codec_head": (jax.random.normal(ks[5], (H, cfg.vocab_size))
                           * 0.02).astype(self.dtype),
            "depth": {
                "backbone": init_depth_params(dcfg, ks[6]),
                "proj": _init_linear(ks[7], H, dcfg.hidden_size, self.dtype,
                                     bias=True),
                "embeds": (jax.random.normal(
                    ks[8], (self.num_code_groups - 1, self.depth_vocab_size, H)
                ) * 0.02).astype(self.dtype),
                "heads": (jax.random.normal(
                    ks[9], (self.num_code_groups - 1, dcfg.hidden_size,
                            self.depth_vocab_size)) * 0.02).astype(self.dtype),
            },
        }
        self._init_codec_params()

    # ---- metadata ----------------------------------------------------------
    @property
    def backbone_config(self):
        return self._cfg

    @property
    def depth_config(self):
        return self._depth_cfg

    @property
    def n_codebooks(self):
        return self.num_code_groups + 1  # + text channel

    @property
    def vocab_size(self):
        return self._cfg.vocab_size

    @property
    def detokenize_interval(self):
        return self._detok_interval

    @property
    def detokenize_overlap(self):
        return 0

    @property
    def max_tokens(self):
        return 2048

    @property
    def output_audio_length(self):
        return self._detok_interval * self._codec_cfg.samples_per_frame

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def supports_audio_input(self):
        return self.tts_model_type == "base"

    @property
    def default_sampling_config(self):
        return SamplingConfig(top_k=50, top_p=1.0, temperature=0.9,
                              repetition_penalty=1.05, repetition_window=-1,
                              max_tokens=self.max_tokens)

    # ---- host-side ---------------------------------------------------------
    def _encode_text(self, text: str) -> list[int]:
        if hasattr(self.text_tokenizer, "encode"):
            return list(self.text_tokenizer.encode(text))
        return list(self.text_tokenizer(text))

    def preprocess(self, prompt=None, audio_path=None, language="english",
                   speaker="ryan", instruct=None, ref_text=None,
                   x_vector_only_mode=False, streaming_first_token=None,
                   is_input_streaming=None, **kwargs) -> PreprocessOutput:
        is_streaming = streaming_first_token is not None or bool(is_input_streaming)
        language = (language or "auto").lower()
        lang_id = LANGUAGE_IDS.get(language)
        if (self.tts_model_type == "custom_voice" and lang_id is None
                and language in ("chinese", "auto")):
            # Chinese dialect speakers carry their dialect's language id
            # (reference qwen3_tts.py:1550-1558; table from the checkpoint
            # config via _load_talker_tables)
            d = self.spk_dialects.get((speaker or "").lower())
            if d:
                lang_id = LANGUAGE_IDS.get(str(d).lower())

        if streaming_first_token is not None:
            text_ids = [int(streaming_first_token)]
        else:
            text = prompt or ""
            text_ids = self._encode_text(text)

        instruct_ids = None
        if instruct and self.tts_model_size != "0b6":
            # exact reference template incl. the im_start/im_end special
            # tokens (reference qwen3_tts.py:1480) — omitting them fed the
            # talker a malformed role segment (VoiceDesign conditions its
            # whole voice on this text)
            instruct_ids = self._encode_text(
                f"<|im_start|>user\n{instruct}<|im_end|>\n")

        # role tokens: stand-in for <|im_start|>assistant\n
        role_ids = self._encode_text("<|im_start|>assistant\n")[:3]
        while len(role_ids) < 3:
            role_ids.append(TTS_PAD)

        if lang_id is None:
            codec_prefix = [CODEC_NOTHINK, CODEC_THINK_BOS, CODEC_THINK_EOS]
        else:
            codec_prefix = [CODEC_THINK, CODEC_THINK_BOS, lang_id,
                            CODEC_THINK_EOS]

        rows = []   # (text_id, codec_id, needs_codec)
        feats = []  # feature rows (hidden,) or None

        if instruct_ids:
            for t in instruct_ids:
                rows.append((t, 0, False)); feats.append(None)
        for t in role_ids:
            rows.append((t, 0, False)); feats.append(None)
        for c in codec_prefix:
            rows.append((TTS_PAD, c, True)); feats.append(None)

        ref_codes = kwargs.get("ref_codes")
        if ref_codes is None and self.tts_model_type == "base" \
                and not x_vector_only_mode and audio_path:
            ref_codes = self._encode_audio_to_codes(audio_path)
        icl = (self.tts_model_type == "base" and not x_vector_only_mode
               and ref_codes is not None)
        if icl and not (ref_text or kwargs.get("ref_codes") is not None):
            # the reference substitutes a DEFAULT audio+ref_text pair here
            # (qwen3_tts.py:1496-1510, downloads an asset); offline we fall
            # back to x-vector-only conditioning — ref codes with an empty
            # reference text is a prompt structure the model never saw
            self.logger.warning(
                "voice clone without ref_text: falling back to x-vector-"
                "only conditioning (provide ref_text for full ICL cloning)")
            icl = False
            ref_codes = None
        if icl and is_streaming:
            # reference rejects ICL + input streaming (qwen3_tts.py:1448-1451)
            raise ValueError("ICL voice clone is incompatible with input "
                             "streaming; use x_vector_only_mode=True")

        spk_feat = None
        if self.tts_model_type == "base":
            # voice clone: speaker embedding position. text side = tts_pad,
            # codec side = x-vector; since embed() always adds the codec
            # embedding of col 0, store (x_vector - codec_pad_embed) in
            # input_features (reference qwen3_tts.py:1660-1676)
            spk_vec = self._extract_speaker_embedding(audio_path)
            codec_pad_embed = np.asarray(
                self.params["codec_embedding"][CODEC_PAD], np.float32)
            spk_feat = spk_vec - codec_pad_embed
            rows.append((TTS_PAD, CODEC_PAD, True)); feats.append(spk_feat)
        elif self.tts_model_type == "custom_voice":
            spk = (speaker or "ryan").lower()
            if spk not in self.spk_ids:
                fallback = next(iter(self.spk_ids))
                self.logger.warning(
                    "unknown speaker %r; falling back to %r (known: %s)",
                    spk, fallback, sorted(self.spk_ids))
                spk = fallback
            spk_id = self.spk_ids[spk]
            rows.append((TTS_PAD, spk_id, True)); feats.append(None)
        # voice_design: no speaker position

        rows.append((TTS_BOS, CODEC_PAD, True)); feats.append(None)

        if icl:
            # ICL mode: ref_text + text + eos + codec_bos + ref-code frames
            # whose depth-codebook embeddings are presummed into
            # input_features (reference qwen3_tts.py:1692-1746)
            ref_codes = np.asarray(ref_codes, np.int64)
            for t in self._encode_text(ref_text or ""):
                rows.append((t, CODEC_PAD, True)); feats.append(None)
            for t in text_ids:
                rows.append((t, CODEC_PAD, True)); feats.append(None)
            rows.append((TTS_EOS, CODEC_PAD, True)); feats.append(None)
            rows.append((TTS_PAD, CODEC_BOS, True)); feats.append(None)
            # gather/sum ON DEVICE and transfer only the (T, H) result —
            # np.asarray(depth embeds) copied the full (15, vocab, H) table
            # to host float32 (~126 MB readback) per ICL request
            cb = np.clip(ref_codes[:, 1:self.num_code_groups], 0,
                         self.depth_vocab_size - 1)  # (T, 15)
            de = self.params["depth"]["embeds"]
            summed = np.asarray(jnp.sum(
                de[jnp.arange(cb.shape[1])[None, :], jnp.asarray(cb), :],
                axis=1), np.float32)  # (T, H)
            for t in range(ref_codes.shape[0]):
                rows.append((TTS_PAD, int(ref_codes[t, 0]), True))
                feats.append(summed[t])
        else:
            for i, t in enumerate(text_ids):
                last = i == len(text_ids) - 1
                codec = CODEC_BOS if (is_streaming and last) else CODEC_PAD
                rows.append((t, codec, True)); feats.append(None)
            if not is_streaming:
                rows.append((TTS_EOS, CODEC_PAD, True)); feats.append(None)
                rows.append((TTS_PAD, CODEC_BOS, True)); feats.append(None)

        T = len(rows)
        C = self.n_codebooks
        input_tokens = np.zeros((T, C), np.int32)
        input_masks = np.zeros((T, C), bool)
        input_features = np.zeros((T, self._cfg.hidden_size), np.float32)
        for i, (txt, codec, needs) in enumerate(rows):
            input_tokens[i, -1] = txt
            input_tokens[i, 0] = codec
            input_masks[i, -1] = needs
            if feats[i] is not None:
                input_features[i] = feats[i]
        return PreprocessOutput(input_tokens=input_tokens,
                                input_masks=input_masks,
                                input_features=input_features)

    def _extract_speaker_embedding(self, audio_path) -> np.ndarray:
        """ECAPA x-vector from reference audio (reference qwen3_tts.py:
        1283-1329: 24 kHz -> 128-bin log-mel -> Qwen3TTSSpeakerEncoder).
        Offline fallback: zero vector (neutral voice)."""
        spk = getattr(self, "_spk_enc_params", None)
        if spk is None or not audio_path:
            return np.zeros((self._cfg.hidden_size,), np.float32)
        from ..encoders.ecapa import ecapa_embed, qwen3_speaker_mel
        from ..utils import load_audio_mono

        audio = load_audio_mono(audio_path, target_sr=24000)
        mel = qwen3_speaker_mel(audio, n_mels=self._spk_enc_cfg.mel_dim)
        emb = ecapa_embed(spk, self._spk_enc_cfg, mel[None].astype(np.float32))
        return np.asarray(emb[0], np.float32)

    #: valid quantizers of the 32-codebook encoder used for ICL ref codes
    #: (reference Qwen3TTSTokenizerV2Model.encoder_valid_num_quantizers)
    ENCODER_VALID_QUANTIZERS = 16

    def _load_codec_encoder(self, state: dict) -> None:
        """The codec checkpoint's encoder is a MimiModel under ``encoder.*``
        (reference qwen3_codec.py:1669-1680) with its own quantizer — loaded
        for the ICL ref-codes path."""
        from ..codecs.mimi import MimiConfig, load_mimi_encoder_params

        try:
            self._enc_mimi_cfg = MimiConfig(
                n_codebooks=32, codebook_size=2048, vq_dim=256,
                hidden_size=512, intermediate_size=2048, head_dim=64,
                num_heads=8, num_kv_heads=8, num_layers=8,
                sliding_window=250, num_filters=64)
            self._codec_encoder = load_mimi_encoder_params(
                state, self._enc_mimi_cfg, prefix="encoder.")
        except Exception as e:
            from ..utils import get_logger

            get_logger("qwen3").warning(
                "codec encoder mapping failed (%s); ICL needs explicit "
                "ref_codes", type(e).__name__)
            self._codec_encoder = None

    def _encode_audio_to_codes(self, audio_path) -> Optional[np.ndarray]:
        """Reference audio -> (T, 16) codec codes for ICL voice clone
        (reference qwen3_tts.py:1330-1360): the 32-quantizer Mimi-style
        encoder runs at 24 kHz and the first 16 codebooks feed the prompt.
        Returns None when encoder assets are unavailable (x-vector-only)."""
        enc = getattr(self, "_codec_encoder", None)
        if enc is None or not audio_path:
            return None
        from ..codecs.mimi import mimi_encode
        from ..utils import load_audio_mono

        audio = load_audio_mono(audio_path, target_sr=24000)
        codes = mimi_encode(enc, None, self._enc_mimi_cfg,
                            jnp.asarray(audio)[None])
        return np.asarray(codes[0]).T[:, :self.ENCODER_VALID_QUANTIZERS]

    def is_stop(self, token_ids: np.ndarray) -> bool:
        return int(token_ids[0]) == CODEC_EOS

    def text_stream_pad_token(self) -> int:
        return TTS_PAD

    def text_stream_eos_token(self) -> int:
        return TTS_EOS

    def tokenize_text_stream(self, text: str) -> list[int]:
        return self._encode_text(text)

    # ---- traced -------------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        text_raw = jnp.take(params["text_embedding"], token_ids[:, -1], axis=0)
        tp = params["text_projection"]
        text_embeds = linear(tp["fc2"], jax.nn.silu(linear(tp["fc1"], text_raw)))
        codec_embeds = jnp.take(params["codec_embedding"], token_ids[:, 0],
                                axis=0)
        if masks is None:
            x = text_embeds + codec_embeds  # decode: always text+codec
        else:
            needs = masks[:, -1:]
            x = jnp.where(needs, text_embeds + codec_embeds, text_embeds)
        if features is not None:
            x = x + features.astype(x.dtype)
        return x

    def logits(self, params, hidden):
        return (hidden @ params["codec_head"])[:, None, :]

    def adjust_logits(self, logits):
        return logits + self._suppress_bias[None, None, :]

    def depth_step(self, params, hidden, cb0, rng):
        d = params["depth"]
        dcfg = self._depth_cfg
        B = hidden.shape[0]
        H = self._cfg.hidden_size

        cb0_embed = jnp.take(params["codec_embedding"], cb0, axis=0)
        x0 = jnp.stack([hidden.astype(self.dtype), cb0_embed], axis=1)
        x0p = linear(d["proj"], x0.reshape(B * 2, H)).reshape(B, 2, -1)
        kc, vc = init_depth_kv(dcfg, B)
        # fuse q|k|v and gate|up once, OUTSIDE the codebook scan
        db = prepare_depth_layers(d["backbone"])
        h, kc, vc = depth_forward(db, dcfg, x0p, 0, kc, vc)

        scfg = self.sampling_config

        def body(carry, i):
            h, kc, vc, feedback = carry
            head_w = jnp.take(d["heads"], i - 1, axis=0)      # (dh, V)
            logits = (h.astype(jnp.float32) @ head_w.astype(jnp.float32))
            tok = sample(logits[:, None, :], scfg,
                         jax.random.fold_in(rng, i), None)[:, 0]
            emb_table = jnp.take(d["embeds"], i - 1, axis=0)  # (V, H)
            ci = jnp.take(emb_table, tok, axis=0)             # (B, H)
            feedback = feedback + ci
            x = linear(d["proj"], ci)[:, None, :]
            h, kc, vc = depth_forward(db, dcfg, x, i + 1, kc, vc)
            return (h, kc, vc, feedback), tok

        feedback0 = jnp.zeros((B, H), self.dtype)
        import os as _os

        # unrolling the codebook scan lets XLA software-pipeline the depth
        # weights' HBM fetches across iterations (experimentally tunable)
        _unroll = int(_os.environ.get("VOX_DEPTH_UNROLL", "1"))
        # scan runs codebooks 1..G-2 (each samples THEN forwards its
        # embedding for the next head); the LAST codebook samples outside
        # the scan — its depth_forward output was discarded, one of G-1
        # forwards per decode frame wasted inside the hot step
        G = self.num_code_groups
        (h, kc, vc, feedback), toks = jax.lax.scan(
            body, (h, kc, vc, feedback0),
            jnp.arange(1, G - 1, dtype=jnp.int32),
            unroll=_unroll)
        head_w = jnp.take(d["heads"], G - 2, axis=0)
        logits = h.astype(jnp.float32) @ head_w.astype(jnp.float32)
        tok_last = sample(logits[:, None, :], scfg,
                          jax.random.fold_in(rng, G - 1), None)[:, 0]
        feedback = feedback + jnp.take(
            jnp.take(d["embeds"], G - 2, axis=0), tok_last, axis=0)
        toks = jnp.concatenate([toks, tok_last[None]], axis=0).T  # (B, 15)
        text_col = jnp.full((B, 1), TTS_PAD, jnp.int32)
        all_ids = jnp.concatenate([cb0[:, None], toks, text_col], axis=1)
        return all_ids, feedback

    # ---- codec ---------------------------------------------------------------
    def detokenize(self, codec_params, token_ids, cache):
        codes = jnp.clip(token_ids[:, :, :-1], 0, self.depth_vocab_size - 1)
        codes = codes.transpose(0, 2, 1)  # (B, 16, interval)
        return qwen3_codec_decode_chunk(codec_params, self._codec_cfg, codes,
                                        cache)

    def init_decoder_cache(self, batch):
        return qwen3_codec_init_cache(self._codec_cfg, batch)
