"""Full-stack HTTP test: launch.py subprocess (dummy model, CPU) -> aiohttp
-> ZMQ -> scheduler daemon -> worker -> streamed WAV back."""

import os
import socket
import subprocess
import sys
import time
import wave
import io

import httpx
import pytest

SERVER_STARTUP_TIMEOUT = 240


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    env = os.environ.copy()
    env["VOX_SERVE_PLATFORM"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ["JAX_COMPILATION_CACHE_DIR"]
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    suffix = f"_test{port}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vox_serve_tpu.launch",
         "--model", "dummy", "--scheduler-type", "input_streaming",
         "--port", str(port), "--host", "127.0.0.1",
         "--max-batch-size", "4", "--max-num-pages", "64",
         "--page-size", "8", "--no-warmup",
         "--socket-suffix", suffix],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + SERVER_STARTUP_TIMEOUT
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError("server process died during startup")
        try:
            r = httpx.get(base + "/health", timeout=2)
            if r.status_code == 200:
                break
        except Exception:
            time.sleep(0.5)
    else:
        proc.kill()
        raise RuntimeError("server did not become healthy")
    yield base
    proc.terminate()
    try:
        proc.wait(timeout=5)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_health(server):
    r = httpx.get(server + "/health")
    assert r.status_code == 200
    assert r.json() == {"status": "healthy"}


def test_generate_streaming_wav(server):
    with httpx.stream("POST", server + "/generate",
                      data={"text": "hello streaming world"},
                      timeout=300) as r:
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("audio/wav")
        body = b"".join(r.iter_bytes())
    assert body[:4] == b"RIFF"
    # strip the 44-byte streaming header; remaining is PCM16
    pcm = body[44:]
    assert len(pcm) > 0 and len(pcm) % 2 == 0


def test_generate_non_streaming_returns_full_wav(server):
    r = httpx.post(server + "/generate",
                   data={"text": "non streaming request", "streaming": "false"},
                   timeout=300)
    assert r.status_code == 200
    wav = wave.open(io.BytesIO(r.content), "rb")
    assert wav.getnchannels() == 1
    assert wav.getsampwidth() == 2
    assert wav.getnframes() > 0


def test_input_streaming_protocol(server):
    r = httpx.post(server + "/generate/stream/start", data={}, timeout=30)
    assert r.status_code == 200
    rid = r.json()["request_id"]

    r = httpx.post(server + f"/generate/stream/{rid}/text",
                   data={"text": "incremental text that is long enough"},
                   timeout=30)
    assert r.status_code == 200
    assert r.json()["status"] == "accepted"

    # stream audio concurrently with ending the text
    import threading
    chunks = []

    def consume():
        with httpx.stream("GET", server + f"/generate/stream/{rid}/audio",
                          timeout=300) as resp:
            assert resp.status_code == 200
            for b in resp.iter_bytes():
                chunks.append(b)

    t = threading.Thread(target=consume)
    t.start()
    time.sleep(1.0)
    r = httpx.post(server + f"/generate/stream/{rid}/end", timeout=30)
    assert r.status_code == 200
    t.join(timeout=300)
    assert not t.is_alive()
    body = b"".join(chunks)
    assert body[:4] == b"RIFF"
    assert len(body) > 44


def test_stream_text_unknown_request_404(server):
    r = httpx.post(server + "/generate/stream/nonexistent/text",
                   data={"text": "x"}, timeout=30)
    assert r.status_code == 404


def test_generate_missing_text_422(server):
    r = httpx.post(server + "/generate", data={}, timeout=30)
    assert r.status_code == 422


def test_prompt_with_pipe_character(server):
    """The ZMQ frame is <json>|<body>; a '|' inside the prompt used to
    truncate the JSON at the wrong separator and silently drop the request
    (client hung to timeout). The parser now consumes the exact JSON prefix."""
    with httpx.stream("POST", server + "/generate",
                      data={"text": "left | middle | right"},
                      timeout=60) as r:
        assert r.status_code == 200
        body = b"".join(r.iter_bytes())
    assert body[:4] == b"RIFF"
    assert len(body) > 44
