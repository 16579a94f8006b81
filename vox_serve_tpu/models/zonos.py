"""Zonos-v0.1 TTS: transformer backbone with 9-codebook DELAY PATTERN ->
DAC 44.1 kHz decode -> resample to 24 kHz.

Behavioral parity with reference model/zonos.py:
  * prefix conditioning: the full ZonosPrefixConditioner stack
    (zonos_conditioning.py — espeak phonemes, 128-d speaker LDA vector via
    the ResNet293/SimAM net, Fourier emotion/fmax/pitch_std/speaking_rate,
    language-id embedding, LayerNorm) builds the prefill rows as
    input_features; espeak runs host-side with a symbol-table fallback
  * 9 codebooks sampled TOGETHER each step (9 output heads, no depth model);
    for the first n-1 steps the trailing codebooks are overwritten with the
    masked token 1025 (delay pattern, zonos.py:879-890) — done INSIDE the
    jitted step via gen_idx so the device-resident feedback buffer carries
    the masked values
  * EOS (1024) only on codebook 0 (logit bias -inf elsewhere, zonos.py:586-587)
  * postprocess reverts the delay: codes[k] = tokens[k : T-n+k, k]
    (zonos.py:922-931), clamp to [0, 1023], DAC decode, resample 44.1->24 kHz
  * sampling min_p 0.1, repetition 3.0 window 2; interval 50 / overlap 9;
    11425 samples per chunk
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.snac import (SNACConfig, init_snac_decoder, load_dac_params,
                           snac_decode)
from ..models.backbone import BackboneConfig, init_backbone_params
from ..models.base import BaseLM, PreprocessOutput
from ..models.zonos_conditioning import (apply_prefix_conditioner,
                                         init_conditioner_params,
                                         load_conditioner_config,
                                         load_conditioner_params,
                                         make_cond_dict)
from ..sampling import SamplingConfig

N_CB = 9
EOS_TOKEN = 1024
MASKED_TOKEN = 1025
LM_VOCAB = 1025  # heads predict [0..1024]; mask token is input-only

# DAC 44.1 kHz decoder expressed in the SNAC machinery: 9 residual codebooks
# at unit stride, hop 512
DAC_CONFIG = SNACConfig(
    sampling_rate=44100, decoder_dim=1536, decoder_rates=(8, 8, 4, 2),
    latent_dim=1024, codebook_size=1024, codebook_dim=8,
    vq_strides=(1,) * 9, noise=False, depthwise=False, attn_window_size=None,
)


def _resample_441_to_24(x: jax.Array) -> jax.Array:
    """Polyphase windowed-sinc resample along the last axis, 44100 -> 24000
    (reference semantics: torchaudio resample, zonos.py:929-935 — ceil
    output-length convention). Delegates to the shared resampler in
    watermark/silentcipher.py."""
    from ..watermark.silentcipher import sinc_resample

    return sinc_resample(x, 44100, 24000, out_len="ceil")


class ZonosLM(BaseLM):
    SAMPLE_RATE = 24000
    needs_input_features = True
    needs_input_masks = True
    supports_audio_input = True  # speaker reference audio

    def __init__(self, model_name: str = "Zyphra/Zonos-v0.1-transformer",
                 dtype=jnp.bfloat16, debug_backbone=None, debug_codec=None, **_):
        super().__init__(model_name, dtype)
        self._cfg = debug_backbone or BackboneConfig(
            vocab_size=LM_VOCAB, hidden_size=2048, num_layers=26,
            num_heads=16, num_kv_heads=16, intermediate_size=8192,
            use_layer_norm=True, rope_theta=10000.0, dtype=dtype,
            # torch nn.LayerNorm eps the checkpoint was trained with
            # (reference zonos.py:36 norm_epsilon=1e-5); the RMSNorm
            # default (1e-6) deviated on every layer
            rms_eps=1e-5,
        )
        self._dac_cfg = debug_codec or DAC_CONFIG
        self._init_params()
        self.sampling_config = self.default_sampling_config
        bias = np.zeros((N_CB, LM_VOCAB), np.float32)
        bias[1:, EOS_TOKEN] = float(np.finfo(np.float32).min)
        self._eos_bias = jnp.asarray(bias)

    def _load_checkpoint(self) -> dict | None:
        """Map Zyphra/Zonos-v0.1-transformer (reference strict-copy loader,
        model/zonos.py:555-571): backbone.* LayerNorm layers with fused
        in_proj and GLU MLP, 9 per-codebook embeddings.{i} (1026 rows) and
        heads.{i} (1025 rows), plus the full prefix_conditioner.* stack."""
        from ..weights import (load_safetensors_state, load_zonos_backbone,
                               resolve_model_dir)

        model_dir = resolve_model_dir(self.model_name)
        if model_dir is None:
            return None
        try:
            state = load_safetensors_state(model_dir)
            cfg = self._cfg
            as_j = lambda n: jnp.asarray(state[n]).astype(self.dtype)
            backbone = load_zonos_backbone(
                state, cfg.num_layers, cfg.num_heads, cfg.num_kv_heads,
                cfg.resolved_head_dim, dtype=self.dtype)
            params = {
                "backbone": backbone,
                "embeds": jnp.stack([as_j(f"embeddings.{i}.weight")
                                     for i in range(N_CB)]),
                "heads": jnp.stack([as_j(f"heads.{i}.weight").T
                                    for i in range(N_CB)]),
            }
            # load BOTH before assigning EITHER: a failure after assigning
            # only _conditioners left the checkpoint's conditioner list
            # zipped against default-config random params — per-request
            # crash or silently wrong prefix rows
            conditioners = load_conditioner_config(model_dir)
            cond_params = load_conditioner_params(
                {k: np.asarray(v) for k, v in state.items()
                 if k.startswith("prefix_conditioner.")},
                conditioners)
            self._conditioners = conditioners
            self._cond_params = cond_params
            return params
        except Exception as e:
            from ..utils import get_logger

            get_logger("zonos").warning(
                "checkpoint mapping failed (%s); random init",
                type(e).__name__)
            return None

    def _load_dac_checkpoint(self):
        """descript/dac_44khz (what the reference's DAC wrapper loads,
        tokenizer/dac.py:10-14)."""
        from ..weights import load_safetensors_state, resolve_model_dir

        model_dir = resolve_model_dir("descript/dac_44khz")
        if model_dir is None:
            return None
        try:
            state = load_safetensors_state(model_dir)
            return load_dac_params(state, self._dac_cfg)
        except Exception as e:
            from ..utils import get_logger

            get_logger("zonos").warning(
                "DAC mapping failed (%s); random init", type(e).__name__)
            return None

    def _load_speaker_encoder(self):
        """Zyphra/Zonos-v0.1-speaker-embedding: ResNet293 base + LDA-128
        torch checkpoints (reference encoder/zonos.py:388-400)."""
        from ..weights import resolve_model_dir

        model_dir = resolve_model_dir("Zyphra/Zonos-v0.1-speaker-embedding")
        if model_dir is None:
            return None
        try:
            import torch

            from ..encoders.zonos_speaker import load_zonos_speaker_params

            sd = torch.load(model_dir / "ResNet293_SimAM_ASP_base.pt",
                            weights_only=True, map_location="cpu")
            lda = torch.load(model_dir / "ResNet293_SimAM_ASP_base_LDA-128.pt",
                             weights_only=True, map_location="cpu")
            return load_zonos_speaker_params(
                {k: v.numpy() for k, v in sd.items()},
                {k: v.numpy() for k, v in lda.items()})
        except Exception as e:
            from ..utils import get_logger

            get_logger("zonos").warning(
                "speaker encoder load failed (%s); learned uncond vector "
                "will be used", type(e).__name__)
            return None

    def _init_params(self):
        cfg = self._cfg
        key = jax.random.key(41)
        ks = jax.random.split(key, 6)
        H = cfg.hidden_size
        self._conditioners = load_conditioner_config(None)
        self._cond_params = init_conditioner_params(
            self._conditioners, H, np.random.default_rng(17))
        self._speaker_params = None
        loaded = self._load_checkpoint() if cfg.hidden_size >= 1024 else None
        if loaded is not None:
            self.params = loaded
            self.codec_params = (self._load_dac_checkpoint()
                                 or init_snac_decoder(self._dac_cfg, ks[4]))
            self._speaker_params = self._load_speaker_encoder()
            return
        self.params = {
            "backbone": init_backbone_params(cfg, ks[0]),
            # 9 embedding tables (1026 rows: 1024 codes + EOS + mask)
            "embeds": (jax.random.normal(ks[1], (N_CB, 1026, H)) * 0.02
                       ).astype(self.dtype),
            # 9 output heads
            "heads": (jax.random.normal(ks[2], (N_CB, H, LM_VOCAB)) * 0.02
                      ).astype(self.dtype),
        }
        self.codec_params = init_snac_decoder(self._dac_cfg, ks[4])
        self.assets_available = False

    # ---- metadata ----------------------------------------------------------
    @property
    def backbone_config(self):
        return self._cfg

    @property
    def n_codebooks(self):
        return N_CB

    @property
    def vocab_size(self):
        return LM_VOCAB

    @property
    def detokenize_interval(self):
        return 50

    @property
    def detokenize_overlap(self):
        return 9

    @property
    def max_tokens(self):
        return 2048

    @property
    def output_audio_length(self):
        # (50 - 9) frames x hop 512 @ 44.1 kHz -> 24 kHz (zonos.py:644-646)
        if self._dac_cfg is DAC_CONFIG:
            return 11425
        frames = self.detokenize_interval - N_CB
        n44 = frames * self._dac_cfg.hop_per_latent
        return -(-n44 * 80 // 147)  # ceil (torchaudio resample semantics)

    @property
    def sample_rate(self):
        return self.SAMPLE_RATE

    @property
    def default_sampling_config(self):
        return SamplingConfig(min_p=0.1, repetition_penalty=3.0,
                              repetition_window=2, max_tokens=self.max_tokens)

    # ---- host-side ---------------------------------------------------------
    def _speaker_vector(self, audio_path) -> np.ndarray | None:
        """Reference speech -> 128-d LDA vector (reference speaker path,
        encoder/zonos.py:406-411). None -> learned uncond vector."""
        if audio_path is None or self._speaker_params is None:
            return None
        try:
            from ..encoders.zonos_speaker import extract_speaker_embedding
            from ..utils import load_audio_mono

            wav, sr = load_audio_mono(audio_path, target_sr=None,
                                      return_sr=True)
            return extract_speaker_embedding(self._speaker_params, wav, sr)
        except Exception as e:
            from ..utils import get_logger

            get_logger("zonos").warning(
                "speaker extraction failed (%s); uncond", type(e).__name__)
            return None

    def preprocess(self, prompt=None, audio_path=None, language="en-us",
                   emotion=None, fmax=None, pitch_std=None,
                   speaking_rate=None, **kwargs) -> PreprocessOutput:
        cond = make_cond_dict(
            prompt or "", language=language,
            speaker=self._speaker_vector(audio_path),
            emotion=emotion,
            **{k: float(v) for k, v in
               (("fmax", fmax), ("pitch_std", pitch_std),
                ("speaking_rate", speaking_rate)) if v is not None})
        feats = apply_prefix_conditioner(
            self._cond_params, self._conditioners, cond)  # (T, H)
        T = feats.shape[0]
        toks = np.full((T, N_CB), MASKED_TOKEN, np.int32)
        masks = np.ones((T, N_CB), bool)
        return PreprocessOutput(input_tokens=toks, input_masks=masks,
                                input_features=feats.astype(np.float32))

    def is_stop(self, token_ids: np.ndarray) -> bool:
        return int(token_ids[0]) == EOS_TOKEN

    # ---- traced ------------------------------------------------------------
    def embed(self, params, token_ids, features, masks):
        ids = jnp.clip(token_ids, 0, 1025)  # (T, 9)
        embs = jax.vmap(lambda tbl, col: jnp.take(tbl, col, axis=0),
                        in_axes=(0, 1), out_axes=1)(params["embeds"], ids)
        x = jnp.sum(embs, axis=1)  # (T, H)
        if masks is not None and features is not None:
            x = jnp.where(masks[:, :1], features.astype(x.dtype), x)
        return x

    def logits(self, params, hidden):
        # (B, H) x (9, H, V) -> (B, 9, V)
        return jnp.einsum("bh,chv->bcv", hidden.astype(jnp.float32),
                          params["heads"].astype(jnp.float32))

    def adjust_logits(self, logits):
        return logits + self._eos_bias[None]

    def post_sample(self, params, hidden, ids, rng, gen_idx=None):
        # delay pattern: at output index g, codebooks j > g emit the masked
        # token (zonos.py:879-890); runs in-jit so the device feedback buffer
        # carries masked values into the next step
        if gen_idx is None:
            return {"sampled": ids}
        col = jnp.arange(N_CB, dtype=jnp.int32)[None, :]
        masked = jnp.where(col > gen_idx[:, None], MASKED_TOKEN, ids)
        return {"sampled": masked}

    # ---- codec -------------------------------------------------------------
    def detokenize(self, codec_params, token_ids, cache):
        """(B, 50, 9) -> revert delay -> DAC decode -> resample."""
        B, T, _ = token_ids.shape
        cols = []
        for k in range(N_CB):
            cols.append(token_ids[:, k:T - N_CB + k, k])
        codes = jnp.clip(jnp.stack(cols, axis=1), 0, 1023)  # (B, 9, T-9)
        codes_list = [codes[:, k] for k in range(N_CB)]
        wav44 = snac_decode(codec_params, self._dac_cfg, codes_list)
        wav24 = _resample_441_to_24(wav44)
        return wav24, None
