"""Logging and small host-side utilities.

Capability parity with the reference's ``vox_serve/utils.py`` (logger factory
with a process-global, thread-safe log level; HF weight download helpers), but
independent code. Weight loading lives in ``weights.py``.
"""

from __future__ import annotations

import logging
import os
import sys
import threading

_LEVEL_LOCK = threading.Lock()
_GLOBAL_LEVEL = logging.INFO
_LOGGERS: dict[str, logging.Logger] = {}

_FMT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def set_global_log_level(level: str | int) -> None:
    """Set the level for all vox_serve_tpu loggers (thread-safe)."""
    global _GLOBAL_LEVEL
    if isinstance(level, str):
        resolved = getattr(logging, level.upper(), None)
        if not isinstance(resolved, int):
            raise ValueError(
                f"unknown log level {level!r}; expected one of "
                "DEBUG/INFO/WARNING/ERROR/CRITICAL")
        level = resolved
    with _LEVEL_LOCK:
        _GLOBAL_LEVEL = level
        for lg in _LOGGERS.values():
            lg.setLevel(level)


def get_logger(name: str) -> logging.Logger:
    """Logger factory; all loggers share the global level."""
    with _LEVEL_LOCK:
        if name in _LOGGERS:
            return _LOGGERS[name]
        lg = logging.getLogger(f"vox_serve_tpu.{name}")
        lg.setLevel(_GLOBAL_LEVEL)
        if not lg.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter(_FMT))
            lg.addHandler(h)
        lg.propagate = False
        _LOGGERS[name] = lg
        return lg


class RankLogger(logging.LoggerAdapter):
    """Prefixes messages with a data-parallel rank, like the reference's
    LoggerAdapter (scheduler/base.py:50-58)."""

    def __init__(self, logger: logging.Logger, rank: int | None):
        super().__init__(logger, {})
        self.rank = rank

    def process(self, msg, kwargs):
        if self.rank is None:
            return msg, kwargs
        return f"[dp rank {self.rank}] {msg}", kwargs


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def apply_platform_override() -> None:
    """Honor VOX_SERVE_PLATFORM=cpu|tpu|axon.

    This environment pre-registers the TPU backend at interpreter startup
    (sitecustomize), so JAX_PLATFORMS in a subprocess env can be ignored; a
    runtime config update is authoritative because backends initialize
    lazily. Must be called before any JAX device use.
    """
    plat = os.environ.get("VOX_SERVE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def load_audio_mono(path: str, target_sr: "int | None",
                    return_sr: bool = False):
    """Read a PCM WAV file -> mono float32 in [-1, 1] at target_sr.

    Host-side reference-audio loader for voice cloning / audio input
    (the reference uses librosa/torchaudio, utils.py:137-219; this build
    keeps the dependency surface to the stdlib: wave + linear resample).
    """
    import wave

    import numpy as np

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if target_sr is not None and sr != target_sr and len(x):
        t_out = np.linspace(0.0, len(x) - 1.0,
                            int(round(len(x) * target_sr / sr)))
        x = np.interp(t_out, np.arange(len(x)), x).astype(np.float32)
        sr = target_sr
    return (x, sr) if return_sr else x
