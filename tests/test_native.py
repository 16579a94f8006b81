import io
import wave

import numpy as np

from vox_serve_tpu.native import f32_to_i16, get_lib, wav_header


def test_native_builds():
    # the image ships cc; the native path should be live
    assert get_lib() is not None


def test_f32_to_i16_matches_numpy():
    x = np.linspace(-1.5, 1.5, 1001).astype(np.float32)
    got = np.frombuffer(f32_to_i16(x), np.int16)
    ref = (np.clip(x, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(got, ref)


def test_wav_header_parses():
    hdr = wav_header(24000, 1, 16, 0)
    assert len(hdr) == 44
    wav = wave.open(io.BytesIO(hdr + b"\x00\x00" * 4), "rb")
    assert wav.getframerate() == 24000
    assert wav.getnchannels() == 1
    assert wav.getsampwidth() == 2


def test_wav_header_streaming_sentinel():
    """Streaming responses use unknown-length sentinel sizes: a saved
    stream must not declare a zero-byte data chunk (spec-strict readers
    decoded 0 frames from curl-saved streams)."""
    import struct

    hdr = wav_header(24000)  # data_len=None -> streaming sentinel
    assert len(hdr) == 44
    assert hdr[:4] == b"RIFF" and hdr[8:16] == b"WAVEfmt "
    riff_size = struct.unpack("<I", hdr[4:8])[0]
    data_size = struct.unpack("<I", hdr[40:44])[0]
    assert data_size != 0
    assert riff_size == 0xFFFFFFFF
    # fixed-length headers still exact
    hdr2 = wav_header(24000, 1, 16, data_len=1000)
    assert struct.unpack("<I", hdr2[40:44])[0] == 1000
    assert struct.unpack("<I", hdr2[4:8])[0] == 1036
