"""Model registry (reference model/__init__.py:17-169).

Pattern -> class map covering the eight reference families plus the
weight-free ``dummy`` smoke model. ``load_model`` resolves the class, builds
it, and applies CLI sampling overrides onto the model's defaults.
"""

from __future__ import annotations

from typing import Callable, Optional

from ..sampling import SamplingConfig
from ..utils import get_logger
from .base import BaseLM, BaseLMWithDepth, PreprocessOutput  # noqa: F401
from .backbone import BackboneConfig  # noqa: F401

logger = get_logger("models")

# name/pattern -> import path (lazy so that heavy models only load on use)
_LAZY_REGISTRY: dict[str, tuple[str, str]] = {}


def _register(patterns: list[str], module: str, cls_name: str) -> None:
    for p in patterns:
        _LAZY_REGISTRY[p.lower()] = (module, cls_name)


_register(["dummy"], "vox_serve_tpu.models.dummy", "DummyLM")
_register(
    ["orpheus", "canopylabs/orpheus-3b-0.1-ft"],
    "vox_serve_tpu.models.orpheus", "OrpheusLM")
_register(["csm", "sesame/csm-1b"], "vox_serve_tpu.models.csm", "CSMLM")
_register(
    ["zonos", "zyphra/zonos-v0.1-transformer"],
    "vox_serve_tpu.models.zonos", "ZonosLM")
_register(
    ["glm", "glm-4-voice", "thudm/glm-4-voice-9b", "zai-org/glm-4-voice-9b"],
    "vox_serve_tpu.models.glm_voice", "GLMVoiceLM")
_register(
    ["step-audio-2", "step-audio-2-mini", "stepfun-ai/step-audio-2-mini"],
    "vox_serve_tpu.models.step_audio_2", "StepAudio2LM")
_register(
    ["chatterbox", "resembleai/chatterbox"],
    "vox_serve_tpu.models.chatterbox", "ChatterboxLM")
_register(
    ["cosyvoice2", "cosyvoice2-0.5b", "funaudiollm/cosyvoice2-0.5b"],
    "vox_serve_tpu.models.cosyvoice2", "CosyVoice2LM")
_register(
    [
        "qwen3-tts", "qwen3-tts-1.7b", "qwen3-tts-0.6b",
        "qwen/qwen3-tts-12hz-1.7b-customvoice",
        "qwen/qwen3-tts-12hz-1.7b-base",
        "qwen/qwen3-tts-12hz-1.7b-voicedesign",
        "qwen/qwen3-tts-12hz-0.6b-customvoice",
        "qwen/qwen3-tts-12hz-0.6b-base",
        "qwen/qwen3-tts-12hz-0.6b-voicedesign",
    ],
    "vox_serve_tpu.models.qwen3_tts", "Qwen3TTSLM")


def available_models() -> list[str]:
    return sorted(_LAZY_REGISTRY)


def get_model_class(model_name: str) -> type[BaseLM]:
    key = model_name.lower()
    if key not in _LAZY_REGISTRY:
        raise ValueError(
            f"unknown model {model_name!r}; available: {available_models()}"
        )
    module_name, cls_name = _LAZY_REGISTRY[key]
    import importlib

    module = importlib.import_module(module_name)
    return getattr(module, cls_name)


def register_model(patterns: list[str], module: str, cls_name: str) -> None:
    _register(patterns, module, cls_name)


def load_model(
    model_name: str,
    top_p: Optional[float] = None,
    top_k: Optional[int] = None,
    min_p: Optional[float] = None,
    temperature: Optional[float] = None,
    max_tokens: Optional[int] = None,
    repetition_penalty: Optional[float] = None,
    repetition_window: Optional[int] = None,
    cfg_scale: Optional[float] = None,
    greedy: bool = False,
    detokenize_interval: Optional[int] = None,
    **model_init_kwargs,
) -> BaseLM:
    cls = get_model_class(model_name)
    if detokenize_interval is not None:
        # only Qwen3-TTS accepts a CLI detokenize interval (reference
        # model/__init__.py:116-128)
        if cls.__name__ != "Qwen3TTSLM":
            raise ValueError(
                "--detokenize-interval is only supported for Qwen3-TTS")
        model_init_kwargs["detokenize_interval"] = detokenize_interval
    model = cls(model_name, **model_init_kwargs)

    # overlay CLI sampling overrides onto model defaults
    base = model.default_sampling_config
    overrides = {}
    for k, v in [
        ("top_p", top_p), ("top_k", top_k), ("min_p", min_p),
        ("temperature", temperature), ("max_tokens", max_tokens),
        ("repetition_penalty", repetition_penalty),
        ("repetition_window", repetition_window), ("cfg_scale", cfg_scale),
    ]:
        if v is not None:
            overrides[k] = v
    if greedy:
        overrides["greedy"] = True
    if overrides.get("cfg_scale") is not None:
        # parity with the reference: the flag is plumbed but no model
        # consumes it in compute (reference worker/base.py:90 stores it,
        # nothing reads it) — warn instead of silently implying guidance
        logger.warning("--cfg-scale is accepted for reference CLI parity "
                       "but classifier-free guidance is not applied by any "
                       "model (the reference does not apply it either)")
    model.sampling_config = base.replace(**overrides) if overrides else base
    logger.info("loaded model %s with sampling %s", model_name,
                model.sampling_config)
    return model
