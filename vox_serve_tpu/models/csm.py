"""CSM-1B TTS: Llama-1B backbone + 100M depth decoder over 32 Mimi codebooks.

Behavioral parity with reference model/csm.py:
  * 33 token channels (32 audio + 1 text); every step's input embedding is
    the MASKED SUM of the per-channel embeddings (csm.py:647-653): prefill
    text rows enable only the text channel, audio-context rows the 32 audio
    channels; decode steps enable audio channels only
  * audio embedding is one big table of 32 x 2051 rows indexed with
    codebook offsets (csm.py:161-167)
  * backbone samples codebook 0; the depth decoder (input projector 2048 ->
    1024, per-position codebook heads) samples 1..31 — run here as one
    lax.scan (models/depth.py)
  * stop: last audio codebook == 0 (csm.py:604-606); interval 10 / overlap 0;
    sampling top_k 50, T 0.9; silentcipher watermarking
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.mimi import MimiConfig, init_mimi, mimi_decode_chunk, mimi_init_cache
from ..models.backbone import BackboneConfig, init_backbone_params, linear, _init_linear
from ..models.base import BaseLMWithDepth, PreprocessOutput
from ..models.depth import (
    DepthConfig, depth_forward, init_depth_kv, init_depth_params,
    prepare_depth_layers,
)
from ..sampling import SamplingConfig, sample
from ..weights import load_text_tokenizer

AUDIO_VOCAB = 2051
TEXT_VOCAB = 128256
N_AUDIO_CB = 32
STOP_TOKEN = 0


class CSMLM(BaseLMWithDepth):
    SAMPLE_RATE = 24000
    needs_input_masks = True
    needs_watermarking = True
    watermarker_type = "silentcipher"

    def __init__(self, model_name: str = "sesame/csm-1b", dtype=jnp.bfloat16,
                 debug_backbone=None, debug_depth=None, debug_codec=None, **_):
        super().__init__(model_name, dtype)
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=AUDIO_VOCAB, hidden_size=2048, num_layers=16,
            num_heads=32, num_kv_heads=8, head_dim=64,
            intermediate_size=8192, rope_theta=500_000.0,
            llama31_rope_scaling=True, dtype=dtype,
        )
        self._depth_cfg = debug_depth or DepthConfig(
            hidden_size=1024, num_layers=4, num_heads=8, num_kv_heads=2,
            head_dim=128, intermediate_size=8192, max_seq=33,
            rope_theta=500_000.0, dtype=dtype,
        )
        self._mimi_cfg = debug_codec or MimiConfig()
        self.text_tokenizer, self.assets_available = load_text_tokenizer(
            model_name, TEXT_VOCAB)
        self._init_params()
        self.sampling_config = self.default_sampling_config

    def _load_checkpoint(self) -> dict | None:
        """Map the HF sesame/csm-1b checkpoint (transformers
        CsmForConditionalGeneration layout: backbone_model.* /
        depth_decoder.* / embed_text_tokens / lm_head; reference loads it via
        from_pretrained at model/csm.py:329). The same checkpoint carries the
        Mimi codec under codec_model.* (mapped in codecs/mimi.py)."""
        from ..weights import (load_llama_family_backbone,
                               load_safetensors_state, resolve_model_dir)

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        try:
            state = load_safetensors_state(model_dir)
            cfg, dcfg = self._cfg, self._depth_cfg
            as_j = lambda n: jnp.asarray(state[n]).astype(self.dtype)
            backbone = load_llama_family_backbone(
                state, cfg.num_layers, prefix="backbone_model.",
                dtype=self.dtype)
            depth_backbone = load_llama_family_backbone(
                state, dcfg.num_layers, prefix="depth_decoder.model.",
                dtype=self.dtype)
            params = {
                "backbone": backbone,
                "audio_embed": as_j(
                    "backbone_model.embed_tokens.embed_audio_tokens.weight"),
                "text_embed": as_j("embed_text_tokens.weight"),
                "lm_head": as_j("lm_head.weight").T,
                "depth": {
                    "backbone": depth_backbone,
                    "proj": {"w": as_j(
                        "depth_decoder.model.inputs_embeds_projector.weight"
                    ).T},
                    # depth's OWN audio embed table (backbone-hidden wide,
                    # offset codebook_idx * vocab like the backbone table)
                    "embeds": as_j("depth_decoder.model.embed_tokens.weight"),
                    # (n_cb-1, depth_hidden, vocab), applied as h @ W[i]
                    "heads": as_j("depth_decoder.codebooks_head.weight"),
                },
            }
            codec = encoder = None
            if any(k.startswith("codec_model.") for k in state):
                from ..codecs.mimi import (load_mimi_encoder_params,
                                           load_mimi_params)

                try:
                    codec = load_mimi_params(state, self._mimi_cfg,
                                             prefix="codec_model.")
                    encoder = load_mimi_encoder_params(
                        state, self._mimi_cfg, prefix="codec_model.")
                except Exception as e:
                    from ..utils import get_logger

                    get_logger("csm").warning(
                        "mimi codec mapping failed (%s); random init",
                        type(e).__name__)
            return {"params": params, "codec": codec, "encoder": encoder,
                    "model_dir": model_dir}
        except Exception as e:
            from ..utils import get_logger

            get_logger("csm").warning(
                "checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    #: default 2-speaker audio-context prompts (reference csm.py:511-568)
    _default_context: Optional[tuple] = None

    def _init_params(self):
        loaded = self._load_checkpoint()
        if loaded is not None:
            self.params = loaded["params"]
            if loaded["codec"] is not None:
                self.codec_params = loaded["codec"]
                self.codec_assets_available = True
            else:
                self.codec_params = init_mimi(self._mimi_cfg,
                                              jax.random.key(7))
                self.codec_assets_available = False
            self._encoder_params = loaded["encoder"]
            if loaded["encoder"] is not None:
                self._set_default_context(loaded["model_dir"])
            return
        self.assets_available = False
        cfg, dcfg = self._cfg, self._depth_cfg
        key = jax.random.key(31)
        ks = jax.random.split(key, 8)
        H = cfg.hidden_size
        self.params = {
            "backbone": init_backbone_params(cfg, ks[0]),
            # one fused audio table (32 codebooks x 2051), backbone hidden
            "audio_embed": (jax.random.normal(
                ks[1], (N_AUDIO_CB * AUDIO_VOCAB, H)) * 0.02).astype(self.dtype),
            "text_embed": (jax.random.normal(ks[2], (TEXT_VOCAB, H)) * 0.02
                           ).astype(self.dtype),
            "lm_head": (jax.random.normal(ks[3], (H, AUDIO_VOCAB)) * 0.02
                        ).astype(self.dtype),
            "depth": {
                "backbone": init_depth_params(dcfg, ks[4]),
                "proj": _init_linear(ks[5], H, dcfg.hidden_size, self.dtype,
                                     bias=False),
                # depth decoder's own audio embed table (HF csm:
                # depth_decoder.model.embed_tokens, backbone-hidden wide)
                "embeds": (jax.random.normal(
                    ks[7], (N_AUDIO_CB * AUDIO_VOCAB, H)) * 0.02
                ).astype(self.dtype),
                # per-position heads for codebooks 1..31
                "heads": (jax.random.normal(
                    ks[6], (N_AUDIO_CB - 1, dcfg.hidden_size, AUDIO_VOCAB))
                    * 0.02).astype(self.dtype),
            },
        }
        self.codec_params = init_mimi(self._mimi_cfg, jax.random.key(77))
        self._encoder_params = None

    # ---- metadata ----------------------------------------------------------
    @property
    def backbone_config(self):
        return self._cfg

    @property
    def depth_config(self):
        return self._depth_cfg

    @property
    def n_codebooks(self):
        return N_AUDIO_CB + 1

    @property
    def vocab_size(self):
        return AUDIO_VOCAB

    @property
    def detokenize_interval(self):
        return 10

    @property
    def detokenize_overlap(self):
        return 0

    @property
    def max_tokens(self):
        return 1200

    @property
    def output_audio_length(self):
        return self.detokenize_interval * self._mimi_cfg.frame_samples

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def default_sampling_config(self):
        return SamplingConfig(top_k=50, temperature=0.9,
                              max_tokens=self.max_tokens)

    # ---- audio context (reference csm.py:511-568) ---------------------------
    #: transcripts of the official sesame/csm-1b speaker prompts
    #: (prompts/conversational_{a,b}.wav; texts from the sesame run_csm
    #: example referenced at csm.py:513)
    _PROMPT_TEXTS = (
        "like revising for an exam I'd have to try and like keep up the "
        "momentum because I'd start really early I'd be like okay I'm gonna "
        "start revising now and then like you're revising for ages and then "
        "I just like start losing steam I didn't do that for the exam we had "
        "recently to be fair that was a more of a last minute scenario but "
        "like yeah I'm trying to like yeah I noticed this yesterday that "
        "like Mondays I sort of start the day with this not like a panic "
        "but like a",
        "like a super Mario level. Like it's very like high detail. And "
        "like, once you get into the park, it just like, everything looks "
        "like a computer game and they have all these, like, you know, if, "
        "if there's like a, you know, like in a Mario game, they will have "
        "like a question block. And if you like, you know, punch it, a coin "
        "will come out. So like everyone, when they come into the park, "
        "they get like this little bracelet and then you can go punching "
        "question blocks around.",
    )

    def _encode_text_segment(self, text: str, speaker: int) -> tuple:
        ids = self._encode_text(f"[{speaker}]{text}")
        T = len(ids)
        toks = np.zeros((T, 33), np.int32)
        masks = np.zeros((T, 33), bool)
        toks[:, -1] = np.asarray(ids, np.int32)
        masks[:, -1] = True
        return toks, masks

    def _encode_text(self, text: str) -> list[int]:
        if hasattr(self.text_tokenizer, "encode"):
            return list(self.text_tokenizer.encode(text))
        return list(self.text_tokenizer(text))

    def _tokenize_audio_segment(self, audio: np.ndarray) -> tuple:
        """audio (S,) 24 kHz -> (T+1, 33) rows: Mimi codes on the 32 audio
        channels plus a trailing zero EOS frame (reference csm.py:487-509)."""
        from ..codecs.mimi import mimi_encode

        codes = mimi_encode(self._encoder_params, self.codec_params,
                            self._mimi_cfg, jnp.asarray(audio)[None])
        codes = np.asarray(codes[0]).T                   # (T, 32)
        codes = np.concatenate([codes, np.zeros((1, 32), codes.dtype)])
        T = len(codes)
        toks = np.zeros((T, 33), np.int32)
        masks = np.zeros((T, 33), bool)
        toks[:, :-1] = codes
        masks[:, :-1] = True
        return toks, masks

    def _set_default_context(self, model_dir) -> None:
        """Build the default 2-speaker context from the prompt wavs shipped
        inside the sesame/csm-1b snapshot (reference csm.py:511-568)."""
        from pathlib import Path

        from ..utils import load_audio_mono

        try:
            segs_t, segs_m = [], []
            for spk, name in enumerate(("conversational_a",
                                        "conversational_b")):
                wav = Path(model_dir) / "prompts" / f"{name}.wav"
                if not wav.exists():
                    return
                tt, tm = self._encode_text_segment(
                    self._PROMPT_TEXTS[spk], speaker=spk)
                at, am = self._tokenize_audio_segment(
                    load_audio_mono(str(wav), target_sr=self.SAMPLE_RATE))
                segs_t += [tt, at]
                segs_m += [tm, am]
            self._default_context = (np.concatenate(segs_t),
                                     np.concatenate(segs_m))
        except Exception as e:
            from ..utils import get_logger

            get_logger("csm").warning(
                "default context build failed (%s); text-only prompts",
                type(e).__name__)

    # ---- host-side ---------------------------------------------------------
    def preprocess(self, prompt=None, audio_path=None, speaker=0, **kwargs
                   ) -> PreprocessOutput:
        toks, masks = self._encode_text_segment(prompt or "", int(speaker))
        if audio_path and getattr(self, "_encoder_params", None) is not None:
            from ..utils import load_audio_mono

            at, am = self._tokenize_audio_segment(
                load_audio_mono(audio_path, target_sr=self.SAMPLE_RATE))
            toks = np.concatenate([toks, at])
            masks = np.concatenate([masks, am])
        if self._default_context is not None:
            ct, cm = self._default_context
            toks = np.concatenate([ct, toks])
            masks = np.concatenate([cm, masks])
        return PreprocessOutput(input_tokens=toks, input_masks=masks)

    def is_stop(self, token_ids: np.ndarray) -> bool:
        # last audio codebook (index -2, before the text channel)
        return int(token_ids[-2]) == STOP_TOKEN

    # ---- traced ------------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        T = token_ids.shape[0]
        audio_ids = jnp.clip(token_ids[:, :-1], 0, AUDIO_VOCAB - 1)
        offsets = (jnp.arange(N_AUDIO_CB, dtype=jnp.int32) * AUDIO_VOCAB)[None]
        audio_emb = jnp.take(params["audio_embed"], audio_ids + offsets,
                             axis=0)                      # (T, 32, H)
        text_ids = jnp.clip(token_ids[:, -1], 0, TEXT_VOCAB - 1)
        text_emb = jnp.take(params["text_embed"], text_ids, axis=0)[:, None]
        all_emb = jnp.concatenate([audio_emb, text_emb], axis=1)  # (T, 33, H)
        if masks is None:
            # decode: audio channels only (csm.py:712-713)
            m = jnp.ones((T, 33, 1), bool).at[:, -1].set(False)
        else:
            m = masks[:, :, None]
        return jnp.sum(all_emb * m, axis=1)

    def logits(self, params, hidden):
        return (hidden @ params["lm_head"])[:, None, :]

    def depth_step(self, params, hidden, cb0, rng):
        d = params["depth"]
        dcfg = self._depth_cfg
        B = hidden.shape[0]
        # depth uses its OWN embed table (HF depth_decoder.model.embed_tokens
        # with offset codebook_idx * vocab)
        c0_embed = jnp.take(d["embeds"],
                            jnp.clip(cb0, 0, AUDIO_VOCAB - 1), axis=0)
        x0 = jnp.stack([hidden.astype(self.dtype), c0_embed], axis=1)
        x0p = linear(d["proj"], x0.reshape(B * 2, -1)).reshape(B, 2, -1)
        kc, vc = init_depth_kv(dcfg, B)
        # fuse q|k|v and gate|up once, OUTSIDE the 31-iteration codebook
        # scan (inside the body XLA re-concatenated ~220 MB per iteration)
        db = prepare_depth_layers(d["backbone"])
        h, kc, vc = depth_forward(db, dcfg, x0p, 0, kc, vc)
        scfg = self.sampling_config

        def body(carry, i):
            h, kc, vc = carry
            head_w = jnp.take(d["heads"], i - 1, axis=0)
            logits = h.astype(jnp.float32) @ head_w.astype(jnp.float32)
            tok = sample(logits[:, None, :], scfg,
                         jax.random.fold_in(rng, i), None)[:, 0]
            ci = jnp.take(d["embeds"],
                          jnp.clip(tok, 0, AUDIO_VOCAB - 1) + i * AUDIO_VOCAB,
                          axis=0)
            x = linear(d["proj"], ci)[:, None, :]
            h, kc, vc = depth_forward(db, dcfg, x, i + 1, kc, vc)
            return (h, kc, vc), tok

        (_, _, _), toks = jax.lax.scan(
            body, (h, kc, vc), jnp.arange(1, N_AUDIO_CB, dtype=jnp.int32))
        toks = toks.T
        text_col = jnp.zeros((B, 1), jnp.int32)
        return jnp.concatenate([cb0[:, None], toks, text_col], axis=1), None

    # ---- codec -------------------------------------------------------------
    def detokenize(self, codec_params, token_ids, cache):
        codes = jnp.clip(token_ids[:, :, :-1], 0, 2047).transpose(0, 2, 1)
        return mimi_decode_chunk(codec_params, self._mimi_cfg, codes, cache)

    def init_decoder_cache(self, batch):
        return mimi_init_cache(self._mimi_cfg, batch)
