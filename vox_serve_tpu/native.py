"""ctypes bindings for the native audio runtime (native/voxaudio.c).

Builds the shared object on first use with the in-image toolchain (no
pybind11 required) and falls back to numpy/stdlib implementations if
compilation is unavailable. Used by the worker for PCM conversion of every
emitted chunk (f32_to_i16) and by the API server for WAV header framing.
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading
import wave
from pathlib import Path

import numpy as np

from .utils import get_logger

logger = get_logger("native")

_LIB = None
_LOCK = threading.Lock()
_SRC = Path(__file__).resolve().parent.parent / "native" / "voxaudio.c"
_SO = Path("/tmp/voxaudio") / "libvoxaudio.so"


def _build() -> Path | None:
    try:
        _SO.parent.mkdir(parents=True, exist_ok=True)
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True)
        return _SO
    except Exception as e:
        logger.warning("native build failed (%s); numpy fallback",
                       type(e).__name__)
        return None


def get_lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        so = _build()
        if so is None:
            _LIB = False
            return None
        lib = ctypes.CDLL(str(so))
        lib.f32_to_i16.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p]
        lib.wav_header.argtypes = [ctypes.c_uint32, ctypes.c_uint16,
                                   ctypes.c_uint16, ctypes.c_uint32,
                                   ctypes.c_void_p]
        _LIB = lib
        return lib


def f32_to_i16(audio: np.ndarray) -> bytes:
    """float32 [-1,1] -> int16 PCM bytes (native when available)."""
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = get_lib()
    if lib is None:
        return (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16).tobytes()
    out = np.empty(audio.size, dtype=np.int16)
    lib.f32_to_i16(audio.ctypes.data, audio.size, out.ctypes.data)
    return out.tobytes()


def wav_header(sample_rate: int, channels: int = 1, bits: int = 16,
               data_len: int = 0) -> bytes:
    lib = get_lib()
    if lib is None:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(channels)
            wf.setsampwidth(bits // 8)
            wf.setframerate(sample_rate)
            wf.writeframes(b"")
        return buf.getvalue()
    out = (ctypes.c_uint8 * 44)()
    lib.wav_header(sample_rate, channels, bits, data_len, out)
    return bytes(out)
