"""Data-parallel replicas: 2 scheduler daemons, round-robin routing."""

import os
import socket
import subprocess
import sys
import time

import httpx
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_dp2_serves_concurrently():
    port = _free_port()
    env = os.environ.copy()
    env["VOX_SERVE_PLATFORM"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ["JAX_COMPILATION_CACHE_DIR"]
    suffix = f"_dp{port}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vox_serve_tpu.launch",
         "--model", "dummy", "--scheduler-type", "online",
         "--port", str(port), "--host", "127.0.0.1",
         "--max-batch-size", "2", "--max-num-pages", "64",
         "--page-size", "8", "--no-warmup", "--dp-size", "2",
         "--socket-suffix", suffix],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError("server died")
            try:
                if httpx.get(base + "/health", timeout=2).status_code == 200:
                    break
            except Exception:
                pass
            time.sleep(1)
        else:
            raise RuntimeError("not healthy in time")

        # four requests round-robin across the two ranks
        results = []
        import threading

        def go(i):
            r = httpx.post(base + "/generate",
                           data={"text": f"dp request {i}",
                                 "streaming": "false"}, timeout=240)
            results.append((i, r.status_code, len(r.content)))

        threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        assert len(results) == 4
        for _, status, size in results:
            assert status == 200
            assert size > 44
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            proc.kill()
