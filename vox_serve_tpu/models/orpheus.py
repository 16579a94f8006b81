"""Orpheus-3B TTS: Llama-3.2-3B backbone -> SNAC 24 kHz vocoder.

Behavioral parity with reference model/orpheus.py:
  * prompt = [128259] + tokenize(f"{voice}: {text}") + [128009, 128260,
    128261, 128257] (orpheus.py:347-367)
  * 1 codebook; stop id 128258 (stop token removed from the audio stream);
    detokenize interval 28 / overlap 21
  * postprocess regroups each 28-token window into 4 frames x 7 tokens,
    remaps ids with (x - 128256 - 10) % 4096, splits into the 3 SNAC streams
    (cols [0] | [1,4] | [2,3,5,6]) and keeps samples [2048:4096] of the
    decoded window (orpheus.py:479-507)
  * sampling defaults: top_p 0.8, T 0.6, repetition 1.3 global
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import BackboneConfig, init_backbone_params
from ..models.base import BaseLM, PreprocessOutput
from ..sampling import SamplingConfig
from ..codecs.snac import SNACConfig, init_snac_decoder, snac_decode
from ..weights import (
    load_embedding, load_head, load_llama_family_backbone,
    load_safetensors_state, load_text_tokenizer, resolve_model_dir,
)

VOICES = ["tara", "leah", "jess", "leo", "dan", "mia", "zac", "zoe"]

AUDIO_TOKEN_OFFSET = 128256 + 10
STOP_TOKEN = 128258
PROMPT_START = 128259
PROMPT_END = [128009, 128260, 128261, 128257]


class OrpheusLM(BaseLM):
    SAMPLE_RATE = 24000

    def __init__(self, model_name: str = "canopylabs/orpheus-3b-0.1-ft",
                 dtype=jnp.bfloat16, debug_backbone=None, debug_codec=None,
                 **_):
        super().__init__(model_name, dtype)
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=156940, hidden_size=3072, num_layers=28, num_heads=24,
            num_kv_heads=8, head_dim=128, intermediate_size=8192,
            rope_theta=500000.0, llama31_rope_scaling=True, dtype=dtype,
        )
        self._snac_cfg = debug_codec or SNACConfig()
        self.text_tokenizer, self.assets_available = load_text_tokenizer(
            model_name, 128256)
        self._load_params()
        self.sampling_config = self.default_sampling_config

    def _load_params(self):
        model_dir = resolve_model_dir(self.model_name)
        key = jax.random.key(0)
        if model_dir is not None:
            try:
                state = load_safetensors_state(model_dir)
                self.params = {
                    "backbone": load_llama_family_backbone(
                        state, self._cfg.num_layers, dtype=self.dtype),
                    "embed": load_embedding(state, "model.embed_tokens.weight",
                                            self.dtype),
                    "head": load_head(state, "lm_head.weight",
                                      "model.embed_tokens.weight", self.dtype),
                }
            except Exception:
                model_dir = None
        if model_dir is None:
            self.params = {
                "backbone": init_backbone_params(self._cfg, key),
                "embed": (jax.random.normal(
                    jax.random.fold_in(key, 1),
                    (self._cfg.vocab_size, self._cfg.hidden_size)) * 0.02
                    ).astype(self.dtype),
                "head": (jax.random.normal(
                    jax.random.fold_in(key, 2),
                    (self._cfg.hidden_size, self._cfg.vocab_size)) * 0.02
                    ).astype(self.dtype),
            }
            self.assets_available = False
        # SNAC decoder (hubertsiuzdak/snac_24khz, reference orpheus.py:247-249)
        self.codec_params = (self._load_snac()
                             or init_snac_decoder(self._snac_cfg,
                                                  jax.random.key(7)))

    def _load_snac(self):
        """Map the published SNAC checkpoint (golden-tested in
        tests/test_snac_parity.py). snac_24khz ships pytorch_model.bin."""
        if self._snac_cfg != SNACConfig():
            return None  # debug dims can't take real weights
        from ..weights import resolve_model_dir

        model_dir = resolve_model_dir("hubertsiuzdak/snac_24khz")
        if model_dir is None:
            return None
        try:
            from ..codecs.snac import load_snac_params

            try:
                from ..weights import load_safetensors_state

                sd = load_safetensors_state(model_dir)
            except FileNotFoundError:
                import torch

                sd = {k: v.numpy() for k, v in torch.load(
                    str(model_dir / "pytorch_model.bin"),
                    map_location="cpu", weights_only=True).items()}
            return load_snac_params(sd, self._snac_cfg)
        except Exception as e:
            from ..utils import get_logger

            get_logger("orpheus").warning(
                "snac checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    # ---- metadata --------------------------------------------------------
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
        return 21

    @property
    def max_tokens(self):
        return 1024

    @property
    def _decoded_window_samples(self):
        # 4 coarse codes x stride 4 = 16 latents x hop samples
        return 16 * self._snac_cfg.hop_per_latent

    @property
    def output_audio_length(self):
        # middle step of the decoded window ([2048:4096] of 8192 at full size)
        return self._decoded_window_samples // 4

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def default_sampling_config(self):
        return SamplingConfig(top_p=0.8, temperature=0.6,
                              repetition_penalty=1.3, repetition_window=-1,
                              max_tokens=self.max_tokens)

    # ---- host-side -------------------------------------------------------
    def preprocess(self, prompt=None, audio_path=None, voice="tara",
                   **kwargs) -> PreprocessOutput:
        assert audio_path is None, "Orpheus is TTS-only"
        if voice and voice not in VOICES:
            raise ValueError(f"voice {voice!r} not in {VOICES}")
        text = f"{voice}: {prompt}" if voice else (prompt or "")
        ids = list(self.text_tokenizer.encode(text)) if hasattr(
            self.text_tokenizer, "encode") else self.text_tokenizer(text)
        all_ids = [PROMPT_START] + list(ids) + PROMPT_END
        return PreprocessOutput(
            input_tokens=np.asarray(all_ids, np.int32)[:, None])

    def is_stop(self, token_ids: np.ndarray) -> bool:
        return int(token_ids[0]) == STOP_TOKEN

    # ---- traced ----------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        return jnp.take(params["embed"], token_ids[:, 0], axis=0)

    def logits(self, params, hidden):
        return (hidden @ params["head"])[:, None, :]

    def detokenize(self, codec_params, token_ids, cache):
        """(B, 28, 1) -> (B, 1, 2048). Stateless (overlap windows)."""
        B = token_ids.shape[0]
        mf = token_ids[:, :, 0].reshape(B, 4, 7)
        mf = jnp.mod(mf - AUDIO_TOKEN_OFFSET, self._snac_cfg.codebook_size)
        codes_0 = mf[:, :, 0]                              # (B, 4)
        codes_1 = mf[:, :, jnp.array([1, 4])].reshape(B, 8)
        codes_2 = mf[:, :, jnp.array([2, 3, 5, 6])].reshape(B, 16)
        audio = snac_decode(codec_params, self._snac_cfg,
                            [codes_0, codes_1, codes_2])
        lo = self._decoded_window_samples // 4
        return audio[:, :, lo:2 * lo], None
