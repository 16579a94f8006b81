"""Chatterbox TTS (ResembleAI): 0.5B "t3" Llama-style backbone with learned
per-segment position embeddings + voice-cloning conditioning -> S3 flow +
HiFT decoder, perth watermarking.

Behavioral parity with reference model/chatterbox.py:
  * t3 backbone: hidden 1024, 30 layers, 16/16 heads, inter 4096, llama3.1
    rope scaling, PLUS learned text/speech position embeddings added to the
    input (chatterbox.py:334-338): prefill rows carry host-computed
    cond/text embeddings (incl. positions) in input_features; decode adds
    speech_pos_emb[gen_idx + 1] in-jit via embed_step
  * conditioning: perceiver cond encoder over speaker emb + 150 prompt
    speech tokens + emotion scalar (encoder/chatterbox.py) — host-side,
    gated on assets; offline uses a zero conditioning prefix
  * speech vocab 6563 (start 6561, stop 6562); stop id 6562; top_p 0.95
    T 0.8 repetition 1.2 global; interval 25 / overlap 3
  * needs perth watermarking (chatterbox.py:532-539)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.cosyvoice_flow import (CosyFlowConfig, init_cosy_flow,
                                     load_cosy_flow_params)
from ..models.flow_common import CosyFlowDecodeMixin
from ..codecs.hifigan import HiFTConfig, init_hift
from ..encoders.mel import MelConfig, log_mel_spectrogram
from ..encoders.perceiver import PerceiverConfig, init_perceiver, perceiver_resample
from ..encoders.speaker import SpeakerEncoderConfig, init_speaker_encoder, speaker_embed
from ..utils import load_audio_mono
from ..models.backbone import BackboneConfig, init_backbone_params
from ..models.base import BaseLM, PreprocessOutput
from ..sampling import SamplingConfig
from ..weights import load_text_tokenizer

SPEECH_VOCAB = 6563
START_SPEECH = 6561
STOP_SPEECH = 6562
TEXT_VOCAB = 704
START_TEXT = 255
STOP_TEXT = 0
COND_LEN = 34  # perceiver output length (32) + speaker + emotion


class ChatterboxLM(CosyFlowDecodeMixin, BaseLM):
    SAMPLE_RATE = 24000
    supports_audio_input = True
    needs_input_features = True
    needs_input_masks = True
    needs_watermarking = True
    watermarker_type = "perth"

    def __init__(self, model_name: str = "ResembleAI/chatterbox",
                 dtype=jnp.bfloat16, debug_backbone=None, debug_flow=None,
                 debug_hift=None, debug_perceiver=None, **_):
        super().__init__(model_name, dtype)
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=SPEECH_VOCAB, hidden_size=1024, num_layers=30,
            num_heads=16, num_kv_heads=16, intermediate_size=4096,
            llama31_rope_scaling=True, rope_theta=500_000.0, dtype=dtype,
        )
        self._flow_cfg = debug_flow or CosyFlowConfig(vocab_size=6561)
        self._hift_cfg = debug_hift or HiFTConfig()
        self.text_tokenizer, self.assets_available = load_text_tokenizer(
            model_name, TEXT_VOCAB)
        key = jax.random.key(71)
        ks = jax.random.split(key, 7)
        H = self._cfg.hidden_size
        loaded = None if debug_backbone is not None else self._load_checkpoint()
        if loaded is not None:
            self.params = loaded
        else:
            if debug_backbone is None:
                self.assets_available = False
            self.params = {
                "backbone": init_backbone_params(self._cfg, ks[0]),
                "text_embed": (jax.random.normal(ks[1], (TEXT_VOCAB, H)) * 0.02
                               ).astype(dtype),
                "speech_embed": (jax.random.normal(ks[2], (SPEECH_VOCAB, H))
                                 * 0.02).astype(dtype),
                "text_pos": (jax.random.normal(ks[3], (2048, H)) * 0.02
                             ).astype(dtype),
                "speech_pos": (jax.random.normal(ks[4], (4096, H)) * 0.02
                               ).astype(dtype),
                "speech_head": (jax.random.normal(ks[5], (H, SPEECH_VOCAB))
                                * 0.02).astype(dtype),
            }
        self.codec_params = {
            "flow": self._load_flow_checkpoint()
            or init_cosy_flow(self._flow_cfg, ks[6]),
            "hift": self._load_hift_checkpoint()
            or init_hift(self._hift_cfg, jax.random.fold_in(key, 9)),
        }
        # voice-cloning conditioning encoder: perceiver resampler over
        # reference-prompt speech features + speaker x-vector + emotion
        # scalar -> COND_LEN rows (encoder/chatterbox.py:209-311 T3Cond)
        H = self._cfg.hidden_size
        self._perc_cfg = debug_perceiver or PerceiverConfig(
            in_dim=H, hidden=H, heads=self._cfg.num_heads,
            n_latents=COND_LEN - 2)
        self.cond_params = {
            "perceiver": init_perceiver(self._perc_cfg,
                                        jax.random.fold_in(key, 11)),
            "spk": init_speaker_encoder(self._spk_cfg,
                                        jax.random.fold_in(key, 12)),
            "spk_proj": (jax.random.normal(jax.random.fold_in(key, 13),
                                           (self._spk_cfg.out_dim, H))
                         * 0.02).astype(jnp.float32),
            "emotion": (jax.random.normal(jax.random.fold_in(key, 14),
                                          (1, H)) * 0.02
                        ).astype(jnp.float32),
        }
        self._encode_cond = jax.jit(self._cond_fn)
        self.sampling_config = self.default_sampling_config

    _spk_cfg = SpeakerEncoderConfig(out_dim=256)

    def _load_checkpoint(self) -> dict | None:
        """Map the ResembleAI/chatterbox ``t3_cfg.safetensors`` checkpoint
        (reference strict load at model/chatterbox.py:419-426: tfmr.* llama
        backbone, text/speech embeddings, learned position tables, speech
        head). The sibling files (s3gen / ve / conds) hold the decoder and
        conditioning weights and are mapped separately."""
        from ..weights import (load_llama_family_backbone,
                               load_safetensors_file, resolve_model_dir)

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        path = model_dir / "t3_cfg.safetensors"
        if not path.exists():
            return None
        try:
            state = load_safetensors_file(path)
            as_j = lambda n: jnp.asarray(state[n]).astype(self.dtype)
            backbone = load_llama_family_backbone(
                state, self._cfg.num_layers, prefix="tfmr.",
                dtype=self.dtype)
            try:
                # weight-exact T3 conditioning encoder (cond_enc.* in the
                # same checkpoint; encoders/chatterbox_cond.py)
                from ..encoders.chatterbox_cond import \
                    load_chatterbox_cond_params

                self._cond_loaded = load_chatterbox_cond_params(state)
            except Exception as ce:
                from ..utils import get_logger

                get_logger("chatterbox").warning(
                    "cond_enc mapping failed (%s)", type(ce).__name__)
            return {
                "backbone": backbone,
                "text_embed": as_j("text_emb.weight"),
                "speech_embed": as_j("speech_emb.weight"),
                "text_pos": as_j("text_pos_emb.emb.weight"),
                "speech_pos": as_j("speech_pos_emb.emb.weight"),
                "speech_head": as_j("speech_head.weight").T,
            }
        except Exception as e:
            from ..utils import get_logger

            get_logger("chatterbox").warning(
                "checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    _cond_loaded = None

    def _load_default_conds(self):
        """conds.pt: the packaged default voice conditionals (reference
        Conditionals.load, model/chatterbox.py:113-124 — gen prompt trimmed
        to 128 tokens / 256 mel rows for constant detokenizer shapes)."""
        from ..weights import resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None or not (model_dir / "conds.pt").exists():
            return None
        try:
            import torch

            kw = torch.load(model_dir / "conds.pt", map_location="cpu",
                            weights_only=True)

            def np_(d):
                return {k: (v.numpy() if torch.is_tensor(v) else v)
                        for k, v in d.items()}

            t3, gen = np_(kw["t3"]), np_(kw["gen"])
            gen["prompt_token"] = np.asarray(gen["prompt_token"])[:, :128]
            gen["prompt_feat"] = np.asarray(gen["prompt_feat"])[:, :256, :]
            return {"t3": t3, "gen": gen}
        except Exception as e:
            from ..utils import get_logger

            get_logger("chatterbox").warning(
                "conds.pt load failed (%s)", type(e).__name__)
            return None

    @functools.cached_property
    def _default_conds(self):
        return self._load_default_conds()

    @functools.cached_property
    def _default_cond_rows(self):
        """(COND_LEN, H) rows for the packaged default voice (the
        reference serves this whenever no reference audio is given,
        model/chatterbox.py:642-653): prompt speech embeddings = speech_emb
        + speech_pos over the stored tokens, through the weight-exact cond
        encoder."""
        if self._cond_loaded is None or self._default_conds is None:
            return None
        from ..encoders.chatterbox_cond import chatterbox_cond_encode

        t3 = self._default_conds["t3"]
        spk = jnp.asarray(np.asarray(t3["speaker_emb"],
                                     np.float32).reshape(-1))
        toks = np.asarray(t3["cond_prompt_speech_tokens"]).reshape(-1)
        emb_tbl = np.asarray(self.params["speech_embed"], np.float32)
        pos_tbl = np.asarray(self.params["speech_pos"], np.float32)
        emb = emb_tbl[toks % emb_tbl.shape[0]] + pos_tbl[:len(toks)]
        emo = float(np.asarray(t3.get("emotion_adv", 0.5)).reshape(-1)[0])
        rows = chatterbox_cond_encode(self._cond_loaded, spk,
                                      jnp.asarray(emb), emo)
        return np.asarray(rows, np.float32)

    @functools.cached_property
    def _host_embed_tables(self):
        """One-time host copies of the immutable embedding tables —
        preprocess converted ~50 MB of tables device->host per request."""
        return (np.asarray(self.params["text_embed"], np.float32),
                np.asarray(self.params["text_pos"], np.float32),
                np.asarray(self.params["speech_embed"], np.float32),
                np.asarray(self.params["speech_pos"], np.float32))

    @functools.cached_property
    def _default_emo(self) -> float:
        if self._default_conds is None:
            return 0.5
        t3 = self._default_conds["t3"]
        return float(np.asarray(t3.get("emotion_adv", 0.5)).reshape(-1)[0])

    def _default_rows_for_emo(self, emo: float):
        from ..encoders.chatterbox_cond import chatterbox_cond_encode

        t3 = self._default_conds["t3"]
        spk = jnp.asarray(np.asarray(t3["speaker_emb"],
                                     np.float32).reshape(-1))
        toks = np.asarray(t3["cond_prompt_speech_tokens"]).reshape(-1)
        emb_tbl = np.asarray(self.params["speech_embed"], np.float32)
        pos_tbl = np.asarray(self.params["speech_pos"], np.float32)
        emb = emb_tbl[toks % emb_tbl.shape[0]] + pos_tbl[:len(toks)]
        return chatterbox_cond_encode(self._cond_loaded, spk,
                                      jnp.asarray(emb), emo)

    def _ref_speech_tokens(self, audio_path: str) -> np.ndarray:
        """Reference WAV -> S3 speech tokens (weight-exact v2 from
        s3gen.safetensors when available; dev fallback otherwise)."""
        from ..encoders.s3_exact import s3v2_encode
        from ..encoders.whisper_exact import whisper_log_mel

        s3_params, s3_cfg = self._s3v2
        wav16 = load_audio_mono(audio_path, 16000)
        mel128 = whisper_log_mel(wav16, n_mels=s3_cfg.n_mels)
        toks = s3v2_encode(s3_params, s3_cfg, jnp.asarray(mel128)[None])
        return np.asarray(toks, np.int64)[0] % SPEECH_VOCAB

    def _exact_ref_cond(self, audio_path: str, emo: float):
        """Reference-audio conditioning through the weight-exact cond
        encoder: exact-S3 prompt speech tokens (+ learned positions) with
        the packaged default speaker embedding (see preprocess comment)."""
        from ..encoders.chatterbox_cond import chatterbox_cond_encode

        toks = np.asarray(self._ref_speech_tokens(audio_path)).reshape(-1)
        toks = toks[:150]  # reference speech_cond_prompt_len
        emb_tbl = np.asarray(self.params["speech_embed"], np.float32)
        pos_tbl = np.asarray(self.params["speech_pos"], np.float32)
        emb = emb_tbl[toks % emb_tbl.shape[0]] + pos_tbl[:len(toks)]
        t3 = (self._default_conds or {}).get("t3", {})
        spk_np = np.asarray(t3.get("speaker_emb",
                                   np.zeros(256)), np.float32).reshape(-1)
        return chatterbox_cond_encode(self._cond_loaded,
                                      jnp.asarray(spk_np),
                                      jnp.asarray(emb), emo)

    def _cond_fn(self, cond_params, ref_mel, ref_feats, ref_mask,
                 exaggeration):
        """ref_mel (1, n_mels, T), ref_feats (1, T', H), ref_mask (1, T')
        -> (COND_LEN, H) conditioning rows in the reference order
        [speaker, perceiver x n_latents, emotion]
        (encoder/chatterbox.py:278-310)."""
        spk = speaker_embed(cond_params["spk"], self._spk_cfg, ref_mel)
        spk_row = spk @ cond_params["spk_proj"]  # (1, H)
        emo_row = exaggeration * cond_params["emotion"]  # (1, H)
        lat = perceiver_resample(cond_params["perceiver"], self._perc_cfg,
                                 ref_feats, ref_mask)[0]  # (n_latents, H)
        return jnp.concatenate([spk_row, lat, emo_row], axis=0)

    @property
    def backbone_config(self):
        return self._cfg

    @property
    def n_codebooks(self):
        return 1

    @property
    def vocab_size(self):
        return SPEECH_VOCAB

    @property
    def detokenize_interval(self):
        return 25

    @property
    def detokenize_overlap(self):
        return 3

    @property
    def max_tokens(self):
        return 1000

    @property
    def output_audio_length(self):
        return (self.detokenize_interval - self.detokenize_overlap) * \
            self._flow_cfg.upsample * self._hift_cfg.total_upsample

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def default_sampling_config(self):
        return SamplingConfig(top_p=0.95, temperature=0.8,
                              repetition_penalty=1.2, repetition_window=-1,
                              max_tokens=self.max_tokens)

    # ---- host-side ---------------------------------------------------------
    def _punc_norm(self, text: str) -> str:
        if not text:
            return "You need to add some text for me to talk."
        if text[0].islower():
            text = text[0].upper() + text[1:]
        text = " ".join(text.split())
        for old, new in [("...", ", "), ("…", ", "), (":", ","), (" - ", ", "),
                         (";", ", "), ("—", "-"), ("–", "-"), (" ,", ","),
                         ("“", '"'), ("”", '"'), ("‘", "'"), ("’", "'")]:
            text = text.replace(old, new)
        text = text.rstrip(" ")
        if not any(text.endswith(p) for p in (".", "!", "?", "-", ",")):
            text += "."
        return text

    def preprocess(self, prompt=None, audio_path=None, exaggeration=None,
                   **kwargs) -> PreprocessOutput:
        text = self._punc_norm(prompt or "").replace(" ", "[SPACE]")
        if hasattr(self.text_tokenizer, "encode"):
            ids = [t % TEXT_VOCAB for t in self.text_tokenizer.encode(text)]
        else:
            ids = [t % TEXT_VOCAB for t in self.text_tokenizer(text)]
        text_ids = [START_TEXT] + ids + [STOP_TEXT]

        # rows: [cond x COND_LEN] + text + [start_speech]
        T = COND_LEN + len(text_ids) + 1
        toks = np.zeros((T, 1), np.int32)
        masks = np.ones((T, 1), bool)
        H = self._cfg.hidden_size
        feats = np.zeros((T, H), np.float32)
        text_tbl, tpos_tbl, spc_tbl, spos_tbl = self._host_embed_tables
        # cond rows: perceiver conditioning from the reference audio when
        # one is given (voice cloning); the packaged default voice
        # (conds.pt through the weight-exact cond encoder) otherwise; zeros
        # as the last-resort neutral fallback
        dci = None
        if audio_path is not None:
            try:
                exo = float(exaggeration if exaggeration is not None else 0.5)
                if self._cond_loaded is not None:
                    # weight-exact T3 cond encoder over exact-S3 prompt
                    # speech tokens (reference chatterbox.py:615-625 +
                    # 348-350). The reference's own VoiceEncoder is never
                    # loaded upstream (self.ve unassigned,
                    # model/chatterbox.py:621), so speaker_emb falls back to
                    # the packaged default voice's stored embedding — the
                    # prompt tokens carry the reference timbre. Previously
                    # this path ran ENTIRELY through randomly-initialized
                    # cond modules even with real weights loaded.
                    cond = self._exact_ref_cond(audio_path, exo)
                else:
                    ref_mel, ref_feats, ref_mask = self._load_ref(audio_path)
                    cond = self._encode_cond(
                        self.cond_params, ref_mel, ref_feats, ref_mask,
                        jnp.float32(exo))
                feats[:COND_LEN] = np.asarray(cond, np.float32)
                # flow x-vector from the s3gen CAMPPlus (reference
                # s3gen.embed_ref; weight-exact encoders/campplus.py)
                spk = self._campplus_xvector(audio_path)
                if spk is not None:
                    # seed the flow token context/positions with the ref
                    # speech tokens (see flow_common.make_flow_cache_row)
                    dci = self.make_flow_cache_row(
                        spk=spk,
                        prompt_tokens=self._ref_speech_tokens(audio_path))
            except Exception:  # unreadable/absent reference: neutral voice
                pass
        elif self._default_cond_rows is not None:
            exo = float(exaggeration if exaggeration is not None else 0.5)
            if abs(exo - self._default_emo) > 1e-6 \
                    and self._cond_loaded is not None:
                # the requested exaggeration differs from the stored
                # emotion_adv: rebuild the cond rows (the cached default
                # made the documented knob a silent no-op)
                feats[:COND_LEN] = np.asarray(
                    self._default_rows_for_emo(exo), np.float32)
            else:
                feats[:COND_LEN] = self._default_cond_rows
            gen = self._default_conds["gen"]
            dci = self.make_flow_cache_row(
                spk=np.asarray(gen["embedding"], np.float32).reshape(-1),
                prompt_feat=np.asarray(gen["prompt_feat"],
                                       np.float32)[0],
                prompt_tokens=np.asarray(gen["prompt_token"]).reshape(-1))
        pos = COND_LEN
        for i, t in enumerate(text_ids):
            feats[pos] = text_tbl[t] + tpos_tbl[i]
            pos += 1
        feats[pos] = spc_tbl[START_SPEECH] + spos_tbl[0]
        return PreprocessOutput(input_tokens=toks, input_masks=masks,
                                input_features=feats,
                                decoder_cache_init=dci)

    @functools.cached_property
    def _campplus_params(self):
        """CAMPPlus weights live inside s3gen.safetensors under
        speaker_encoder.* (reference tokenizer/chatterbox.py:780)."""
        from ..weights import load_safetensors_file, resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None or not (model_dir / "s3gen.safetensors").exists():
            return None
        try:
            from ..encoders.campplus import load_campplus_params

            sd = load_safetensors_file(model_dir / "s3gen.safetensors")
            return load_campplus_params(sd, prefix="speaker_encoder.")
        except Exception as e:
            from ..utils import get_logger

            get_logger("chatterbox").warning(
                "campplus mapping failed (%s)", type(e).__name__)
            return None

    def _campplus_xvector(self, audio_path):
        if self._campplus_params is None:
            return None
        from ..encoders.campplus import campplus_embed, kaldi_fbank

        wav = load_audio_mono(audio_path, 16000)
        feat = kaldi_fbank(wav)
        emb = campplus_embed(self._campplus_params,
                             jnp.asarray(feat)[None])[0]
        return np.asarray(emb, np.float32)

    def _load_ref(self, audio_path):
        """Reference audio -> (mel (1, M, T), prompt feats (1, T', H),
        mask (1, T')). Prompt features are speech-embedding rows of the
        S3-tokenized reference (the reference feeds prompt speech TOKENS to
        the perceiver, chatterbox.py:87-124); offline this tokenization uses
        the randomly-initialized S3 encoder, preserving shapes/dataflow."""
        wav = load_audio_mono(audio_path, self.SAMPLE_RATE)
        mel_cfg = MelConfig(sample_rate=self.SAMPLE_RATE,
                            n_mels=self._spk_cfg.n_mels)
        mel = log_mel_spectrogram(jnp.asarray(wav)[None], mel_cfg)
        # S3 v2 (weight-exact from s3gen.safetensors when present — the
        # reference's ChatterboxDecoder embeds it under tokenizer.*,
        # tokenizer/chatterbox.py:778 — random-init dev config otherwise)
        from ..encoders.s3_exact import s3v2_encode
        from ..encoders.whisper_exact import whisper_log_mel

        s3_params, s3_cfg = self._s3v2
        wav16 = load_audio_mono(audio_path, 16000)
        mel128 = whisper_log_mel(wav16, n_mels=s3_cfg.n_mels)
        toks = s3v2_encode(s3_params, s3_cfg, jnp.asarray(mel128)[None])
        toks = toks[:, : self._perc_cfg.max_prompt] % SPEECH_VOCAB
        spc_tbl = jnp.asarray(self.params["speech_embed"], jnp.float32)
        feats = spc_tbl[toks]  # (1, T', H)
        mask = jnp.ones(toks.shape, bool)
        return mel, feats, mask

    @functools.cached_property
    def _s3v2(self):
        """S3 v2 params + config: weight-exact from s3gen.safetensors when
        present (the reference's ChatterboxDecoder embeds the tokenizer, so
        its weights ship under tokenizer.*); explicit random-init dev
        fallback of the SAME implementation otherwise — one S3 source of
        truth (encoders/s3_exact.py)."""
        from ..encoders.s3_exact import (S3V2Config, init_s3v2_params,
                                         load_s3v2_params)
        from ..weights import load_safetensors_file, resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is not None and (model_dir / "s3gen.safetensors").exists():
            try:
                cfg = S3V2Config()
                sd = load_safetensors_file(model_dir / "s3gen.safetensors")
                return load_s3v2_params(sd, cfg, prefix="tokenizer."), cfg
            except Exception as e:
                from ..utils import get_logger

                get_logger("chatterbox").warning(
                    "S3 v2 mapping failed (%s)", type(e).__name__)
        dev_cfg = S3V2Config(n_state=256, heads=4, layers=2)
        return init_s3v2_params(jax.random.key(23), dev_cfg), dev_cfg

    def is_stop(self, token_ids: np.ndarray) -> bool:
        return int(token_ids[0]) == STOP_SPEECH

    # ---- traced ------------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        x = jnp.take(params["speech_embed"],
                     jnp.clip(token_ids[:, 0], 0, SPEECH_VOCAB - 1), axis=0)
        if masks is not None and features is not None:
            x = jnp.where(masks[:, :1], features.astype(x.dtype), x)
        return x

    def embed_step(self, params, token_ids, features, masks, positions,
                   gen_idx):
        x = self.embed(params, token_ids, features, masks)
        if masks is None and gen_idx is not None:
            # decode: generated speech token #g sits at speech position g+1
            # (start_speech occupies position 0, chatterbox.py:337-338)
            spos = jnp.take(params["speech_pos"],
                            jnp.clip(gen_idx + 1, 0, 4095), axis=0)
            x = x + spos.astype(x.dtype)
        return x

    def logits(self, params, hidden):
        return (hidden @ params["speech_head"])[:, None, :]

    # ---- codec -------------------------------------------------------------
    # detokenize / init_decoder_cache come from CosyFlowDecodeMixin (the
    # weight-exact CosyVoice-family flow the reference s3gen uses +
    # streaming HiFT, left-context recompute)

    def _load_flow_checkpoint(self):
        """Map the s3gen.safetensors flow weights (reference
        model/chatterbox.py:430-437 loads them strict=False; the flow
        submodule lives under the ``flow.`` prefix)."""
        from ..weights import load_safetensors_file, resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        path = model_dir / "s3gen.safetensors"
        if not path.exists():
            return None
        try:
            sd = load_safetensors_file(path)
            return load_cosy_flow_params(sd, self._flow_cfg, prefix="flow.")
        except Exception as e:
            from ..utils import get_logger

            get_logger("chatterbox").warning(
                "flow checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    def _load_hift_checkpoint(self):
        """HiFT weights live in s3gen.safetensors under ``mel2wav.``."""
        from ..codecs.hifigan import load_hift_params
        from ..weights import load_safetensors_file, resolve_model_dir

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        path = model_dir / "s3gen.safetensors"
        if not path.exists():
            return None
        try:
            sd = load_safetensors_file(path)
            return load_hift_params(sd, self._hift_cfg, prefix="mel2wav.")
        except Exception as e:
            from ..utils import get_logger

            get_logger("chatterbox").warning(
                "hift checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None
