"""ctypes bindings for the native audio runtime (native/voxaudio.c).

Builds the shared object on first use with the in-image toolchain (no
pybind11 required) and falls back to numpy implementations if compilation is
unavailable. Used by the API server for PCM conversion, WAV header framing,
and per-request SPSC chunk rings.
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
        lib.ring_new.restype = ctypes.c_void_p
        lib.ring_new.argtypes = [ctypes.c_uint64]
        lib.ring_free.argtypes = [ctypes.c_void_p]
        lib.ring_size.restype = ctypes.c_uint64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_write.restype = ctypes.c_int64
        lib.ring_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_uint64]
        lib.ring_read.restype = ctypes.c_int64
        lib.ring_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_uint64]
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


class ChunkRing:
    """SPSC byte ring for per-request audio chunk queues."""

    def __init__(self, capacity: int = 1 << 20):
        self._lib = get_lib()
        if self._lib is not None:
            self._ptr = self._lib.ring_new(capacity)
        else:
            self._buf = bytearray()

    def write(self, data: bytes) -> bool:
        if self._lib is not None:
            return self._lib.ring_write(self._ptr, data, len(data)) >= 0
        self._buf.extend(data)
        return True

    def read(self, n: int) -> bytes:
        if self._lib is not None:
            out = ctypes.create_string_buffer(n)
            got = self._lib.ring_read(self._ptr, out, n)
            return out.raw[:got]
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def size(self) -> int:
        if self._lib is not None:
            return self._lib.ring_size(self._ptr)
        return len(self._buf)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_ptr", None):
            self._lib.ring_free(self._ptr)
