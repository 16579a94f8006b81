"""ctypes bindings for the native audio runtime (native/voxaudio.c).

Builds the shared object on first use with the in-image toolchain (no
pybind11 required) and falls back to numpy/stdlib implementations if
compilation is unavailable. Used by the worker for PCM conversion of every
emitted chunk (f32_to_i16) and by the API server for WAV header framing.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile
import threading
from pathlib import Path

import numpy as np

from .utils import get_logger

logger = get_logger("native")

_LIB = None
_LOCK = threading.Lock()
_SRC = Path(__file__).resolve().parent.parent / "native" / "voxaudio.c"
#: per-uid build dir: a shared fixed /tmp path let another user pre-plant a
#: newer .so that the mtime check would happily CDLL into this process
_SO = Path(tempfile.gettempdir()) / f"voxaudio-{os.getuid()}" / "libvoxaudio.so"

#: RIFF streaming sentinel: unknown-length sizes (players treat the data
#: chunk as extending to EOF; a literal 0 makes spec-strict readers decode
#: zero frames from a saved stream). Chosen so both the RIFF size
#: (data_len + 36) and the data-chunk size wrap to ~0xFFFFFFFF.
STREAMING_DATA_LEN = 0xFFFFFFFF - 36


def _build() -> Path | None:
    try:
        _SO.parent.mkdir(parents=True, exist_ok=True)
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            # build to a unique temp name then atomically rename: dp_size>1
            # daemons race this build on first run, and CDLL'ing a
            # partially-written .so crashes the process
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=str(_SO.parent))
            os.close(fd)
            try:
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, str(_SRC)],
                    check=True, capture_output=True)
                os.replace(tmp, _SO)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        return _SO
    except Exception as e:
        logger.warning("native build failed (%s); numpy fallback",
                       type(e).__name__)
        return None


def get_lib():
    global _LIB
    if _LIB is not None:  # lock-free fast path (per-chunk hot path)
        return _LIB or None
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
               data_len: int | None = None) -> bytes:
    """44-byte RIFF/WAVE header. data_len=None means a live stream of
    unknown length (sentinel sizes); pass the real byte count for files."""
    if data_len is None:
        data_len = STREAMING_DATA_LEN
    lib = get_lib()
    if lib is not None:
        out = (ctypes.c_uint8 * 44)()
        lib.wav_header(sample_rate, channels, bits, data_len, out)
        return bytes(out)
    # stdlib fallback mirroring the native layout (the wave module cannot
    # write sentinel sizes)
    byte_rate = sample_rate * channels * (bits // 8)
    block_align = channels * (bits // 8)
    return (b"RIFF"
            + struct.pack("<I", (data_len + 36) & 0xFFFFFFFF)
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                          byte_rate, block_align, bits)
            + b"data" + struct.pack("<I", data_len & 0xFFFFFFFF))
