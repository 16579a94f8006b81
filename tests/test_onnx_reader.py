"""Round-trip test for the minimal ONNX initializer extractor: hand-encode a
tiny ModelProto in protobuf wire format and parse it back."""

import struct

import numpy as np

from vox_serve_tpu.onnx_reader import load_onnx_initializers


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    head = _varint((num << 3) | wire)
    if wire == 2:
        return head + _varint(len(payload)) + payload
    return head + payload


def _tensor(name: str, arr: np.ndarray, use_raw=True) -> bytes:
    body = b""
    for d in arr.shape:
        body += _field(1, 0, _varint(d))
    dt = {np.float32: 1, np.int64: 7, np.float16: 10}[arr.dtype.type]
    body += _field(2, 0, _varint(dt))
    body += _field(8, 2, name.encode())
    if use_raw:
        body += _field(9, 2, arr.tobytes())
    elif arr.dtype == np.float32:
        packed = b"".join(struct.pack("<f", x) for x in arr.ravel())
        body += _field(4, 2, packed)
    return body


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((3, 4)).astype(np.float32)
    w2 = rng.integers(0, 100, (5,)).astype(np.int64)
    w3 = rng.standard_normal((2, 2, 2)).astype(np.float16)
    w4 = rng.standard_normal((6,)).astype(np.float32)

    graph = (_field(5, 2, _tensor("layer.weight", w1))
             + _field(5, 2, _tensor("ids", w2))
             + _field(1, 2, b"\x08\x01")  # a node entry to skip
             + _field(5, 2, _tensor("half", w3))
             + _field(5, 2, _tensor("packed_floats", w4, use_raw=False)))
    model = (_field(1, 0, _varint(8))           # ir_version
             + _field(7, 2, graph))             # graph

    path = tmp_path / "tiny.onnx"
    path.write_bytes(model)

    out = load_onnx_initializers(path)
    assert set(out) == {"layer.weight", "ids", "half", "packed_floats"}
    np.testing.assert_array_equal(out["layer.weight"], w1)
    np.testing.assert_array_equal(out["ids"], w2)
    np.testing.assert_array_equal(out["half"], w3)
    np.testing.assert_allclose(out["packed_floats"], w4, rtol=1e-6)
