"""Model abstraction for TPU serving.

Counterpart of the reference ``vox_serve/model/base.py:29-447``, re-designed
for XLA: instead of an eager ``forward``/``sampling`` pair plus a CPU
coroutine, a model contributes

  * **one traced step function** ``lm_step`` (embed -> backbone -> logits ->
    fused sampling [-> depth-transformer scan]) that the worker jits once per
    (phase, batch-bucket). Everything in it is shape-static.
  * **host-side request logic**: ``preprocess`` (prompt/audio -> tokens),
    ``update_request_state`` (append outputs, stop detection, audio-token
    filtering / delay-pattern revert — the reference's deferred sampling
    coroutine, run on host numpy), and static metadata properties.
  * **a traced detokenize function** turning (B, chunk, C) token windows plus
    per-slot codec caches into PCM chunks.

Depth-transformer models (reference ``BaseLMWithDepth``, csm.py / qwen3_tts.py)
run their whole codebook loop as a ``lax.scan`` *inside* ``lm_step`` — one
executable instead of n_codebooks-1 CUDA-graph replays per decode step
(reference worker/cuda_graph_worker.py:1058-1160).
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import AttnMetadata
from ..models.backbone import BackboneConfig, backbone_forward
from ..sampling import SamplingConfig, sample_and_update
from ..requests import Request


@dataclasses.dataclass
class PreprocessOutput:
    """Host-side result of prompt preprocessing (reference model/base.py:13-26)."""

    input_tokens: np.ndarray  # (seq, n_codebooks) int32
    input_features: Optional[np.ndarray] = None
    input_masks: Optional[np.ndarray] = None
    decoder_cache_init: Optional[Any] = None  # pytree (unbatched) for the slot


@dataclasses.dataclass
class StepOutput:
    """Traced outputs of one LM step (all device arrays)."""

    sampled: jax.Array  # (B, n_codebooks) int32
    k_pages: jax.Array
    v_pages: jax.Array
    repetition_cache: Optional[jax.Array] = None
    feedback: Optional[jax.Array] = None  # (B, feedback_dim) for next step
    aux: Optional[dict] = None


class BaseLM(abc.ABC):
    """Abstract model. Subclasses own their parameter pytrees (``self.params``
    for the LM, ``self.codec_params`` for the detokenizer)."""

    def __init__(self, model_name: str, dtype=jnp.bfloat16):
        self.model_name = model_name
        self.dtype = dtype
        self.params: dict = {}
        self.codec_params: dict = {}

    # ---- static metadata ------------------------------------------------
    @property
    @abc.abstractmethod
    def backbone_config(self) -> BackboneConfig: ...

    @property
    @abc.abstractmethod
    def n_codebooks(self) -> int: ...

    @property
    @abc.abstractmethod
    def vocab_size(self) -> int: ...

    @property
    @abc.abstractmethod
    def detokenize_interval(self) -> int: ...

    @property
    @abc.abstractmethod
    def detokenize_overlap(self) -> int: ...

    @property
    @abc.abstractmethod
    def max_tokens(self) -> int: ...

    @property
    def n_channels(self) -> int:
        return 1

    @property
    @abc.abstractmethod
    def output_audio_length(self) -> int:
        """Samples emitted per detokenize chunk (after model-side slicing)."""

    @property
    def sample_rate(self) -> int:
        return 24000

    @property
    def default_sampling_config(self) -> SamplingConfig:
        return SamplingConfig()

    # resolved by load_model (defaults + CLI overrides)
    sampling_config: SamplingConfig = SamplingConfig()

    # ---- capability flags ------------------------------------------------
    has_depth_transformer: bool = False
    supports_audio_input: bool = False
    needs_watermarking: bool = False
    watermarker_type: Optional[str] = None
    needs_input_features: bool = False
    needs_input_masks: bool = False
    supports_input_streaming: bool = False
    #: set by the worker: route decode attention through the Pallas kernel
    use_pallas_attention: bool = False
    #: set by the worker when the KV pool is quantized (int8/f8): static
    #: (k_scale, v_scale) dequant multipliers threaded into the backbone
    #: (ops/kv_cache.py KVCacheConfig.kv_scales)
    kv_quant_scales: tuple[float, float] | None = None
    #: dim of per-slot feedback features produced each step (0 = none).
    feedback_dim: int = 0
    #: logits cover only codebook 0 (depth models sample the rest)
    single_cb_logits: bool = False
    #: raw sampled rows ARE audio-token rows (no delay revert / interleave
    #: filtering in update_request_state) — enables the chained cold-start
    #: executable that feeds scan outputs straight into detokenize
    supports_chained_detok: bool = False

    @property
    def use_repetition_penalty(self) -> bool:
        return self.sampling_config.uses_repetition_penalty

    # ---- host-side logic -------------------------------------------------
    @abc.abstractmethod
    def preprocess(self, prompt: str | None = None,
                   audio_path: str | None = None, **kwargs) -> PreprocessOutput:
        ...

    @abc.abstractmethod
    def is_stop(self, token_ids: np.ndarray) -> bool:
        """token_ids: (n_codebooks,) — stop-token test for one step's output."""

    def update_request_state(self, req: Request, sampled: np.ndarray) -> None:
        """Append one step's sampled tokens and update stop/audio state.

        Default: every output token is an audio token; stop tokens end
        generation and are not emitted as audio. Models with delay patterns /
        interleaved text+audio override this.
        """
        req.lm_output_tokens.append(sampled)
        if self.is_stop(sampled):
            req.done_lm_generation = True
            req.finish_reason = "stop"
        else:
            # a cap-hitting token is a valid audio token — emit it
            req.lm_output_audio_tokens.append(sampled)
            if self.hit_length_cap(req):
                req.done_lm_generation = True
                req.finish_reason = "length"

    def effective_max_tokens(self, req: Request) -> int:
        mt = req.sampling_config.max_tokens if (
            req.sampling_config and req.sampling_config.max_tokens
        ) else self.sampling_config.max_tokens
        return mt or self.max_tokens

    def hit_length_cap(self, req: Request) -> bool:
        """Length cap uses the reference's ABSOLUTE-position semantics: stop
        once prompt + generated positions exceed max_tokens (reference
        model/*.py ``next_position_id > max_tokens``), not a generated-token
        count."""
        return req.next_position_id > self.effective_max_tokens(req)

    # input streaming hooks (Qwen3-TTS only in the reference)
    #: which token column carries streamed text (Qwen3 dual-channel: -1)
    text_channel_index: int = 0

    def text_stream_pad_token(self) -> int:
        raise NotImplementedError

    def text_stream_eos_token(self) -> int:
        raise NotImplementedError

    def tokenize_text_stream(self, text: str) -> list[int]:
        raise NotImplementedError

    # ---- traced model functions -------------------------------------------
    @abc.abstractmethod
    def embed(self, params: dict, token_ids: jax.Array,
              features: jax.Array | None, masks: jax.Array | None) -> jax.Array:
        """(T, C) int32 [+ features/masks] -> (T, hidden)."""

    def embed_step(self, params, token_ids, features, masks, positions,
                   gen_idx) -> jax.Array:
        """Position-aware embedding hook (Chatterbox adds learned per-segment
        position embeddings here); defaults to embed()."""
        return self.embed(params, token_ids, features, masks)

    @abc.abstractmethod
    def logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        """(B, hidden) -> (B, C_logits, vocab)."""

    def adjust_logits(self, logits: jax.Array) -> jax.Array:
        """Hook for static logit masking (suppress tokens, EOS biasing)."""
        return logits

    def lm_step(
        self,
        params: dict,
        token_ids: jax.Array,        # (T, C) int32
        positions: jax.Array,        # (T,) int32
        features: jax.Array | None,  # (T, F) or None
        masks: jax.Array | None,
        meta: AttnMetadata,
        k_pages: jax.Array,
        v_pages: jax.Array,
        rng: jax.Array,
        repetition_cache: jax.Array | None,
        last_token_idx: jax.Array | None = None,  # (B,) gather for prefill
        gen_idx: jax.Array | None = None,         # (B,) output-token index
        depth_state: Any = None,
    ) -> StepOutput:
        """One full traced LM step. Decode: T == B. Prefill: gather hidden at
        ``last_token_idx`` before the head."""
        x = self.embed_step(params, token_ids, features, masks, positions,
                            gen_idx)
        h, k_pages, v_pages = backbone_forward(
            params["backbone"], self.backbone_config, x, positions, meta,
            k_pages, v_pages, use_pallas=self.use_pallas_attention,
            kv_scales=self.kv_quant_scales,
        )
        if last_token_idx is not None:
            h = jnp.take(h, last_token_idx, axis=0)  # (B, hidden)
        logits = self.adjust_logits(self.logits(params, h))
        ids, rep = sample_and_update(logits, self.sampling_config, rng,
                                     repetition_cache)
        out = self.post_sample(params, h, ids, rng, gen_idx=gen_idx)
        return StepOutput(
            sampled=out["sampled"],
            k_pages=k_pages,
            v_pages=v_pages,
            repetition_cache=rep,
            feedback=out.get("feedback"),
        )

    def post_sample(self, params: dict, hidden: jax.Array,
                    ids: jax.Array, rng: jax.Array,
                    gen_idx: jax.Array | None = None) -> dict:
        """Hook for depth models (sample remaining codebooks), feedback, and
        delay-pattern masking. ids: (B, C_logits) -> {"sampled": (B, C), ...}."""
        if ids.shape[1] == self.n_codebooks:
            return {"sampled": ids}
        pad = jnp.zeros((ids.shape[0], self.n_codebooks - ids.shape[1]),
                        dtype=ids.dtype)
        return {"sampled": jnp.concatenate([ids, pad], axis=1)}

    # ---- traced detokenizer -------------------------------------------------
    @abc.abstractmethod
    def detokenize(self, codec_params: dict, token_ids: jax.Array,
                   cache: Any | None) -> tuple[jax.Array, Any | None]:
        """(B, interval, C) int32 + per-slot cache -> ((B, n_channels,
        output_audio_length) float in [-1, 1], new cache)."""

    def init_decoder_cache(self, batch: int) -> Any | None:
        """Batched codec cache pytree (leading dim = batch) or None."""
        return None


class BaseLMWithDepth(BaseLM):
    """Backbone + depth transformer over codebooks (CSM, Qwen3-TTS).

    The depth loop runs as a lax.scan inside lm_step: depth "prefill" over
    [hidden; embed(cb0)] then one tiny decode per codebook, with a dense
    per-step KV (seq <= n_codebooks + 1 — no paging needed at this scale).
    """

    has_depth_transformer = True
    single_cb_logits = True

    @property
    @abc.abstractmethod
    def depth_config(self) -> BackboneConfig: ...

    @abc.abstractmethod
    def depth_step(self, params: dict, hidden: jax.Array, cb0: jax.Array,
                   rng: jax.Array) -> tuple[jax.Array, jax.Array | None]:
        """hidden: (B, H) final backbone hidden; cb0: (B,) sampled codebook 0.
        Returns ((B, n_codebooks) all codebook ids, feedback or None)."""

    def post_sample(self, params, hidden, ids, rng, gen_idx=None):
        all_ids, feedback = self.depth_step(params, hidden, ids[:, 0], rng)
        return {"sampled": all_ids, "feedback": feedback}
