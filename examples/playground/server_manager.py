"""vox_serve_tpu server lifecycle manager for the playground.

TPU-native analogue of the reference playground's VoxServeServerManager
(reference examples/playground/server_manager.py): launches
``python -m vox_serve_tpu.launch`` as a subprocess, tails its logs into a
ring buffer, polls /health until ready (the server reports 503 "warming"
during model init + warmup), and stops it cleanly. Device selection is
TPU-chip index based (VOX_SERVE_PLATFORM) instead of CUDA_VISIBLE_DEVICES.
"""

from __future__ import annotations

import collections
import dataclasses
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request


@dataclasses.dataclass
class ServerConfig:
    model: str = "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice"
    port: int = 12345
    host: str = "127.0.0.1"
    scheduler_type: str = "online"
    max_batch_size: int = 8
    max_num_pages: int = 2048
    page_size: int = 16
    dp_size: int = 1
    enable_disaggregation: bool = False
    tp_size: int = 1
    top_p: float | None = None
    top_k: int | None = None
    temperature: float | None = None
    max_tokens: int | None = None
    repetition_penalty: float | None = None
    greedy: bool = False
    detokenize_interval: int | None = None
    log_level: str = "info"
    extra_args: tuple[str, ...] = ()

    def to_argv(self) -> list[str]:
        argv = [
            sys.executable, "-m", "vox_serve_tpu.launch",
            "--model", self.model,
            "--host", self.host, "--port", str(self.port),
            "--scheduler-type", self.scheduler_type,
            "--max-batch-size", str(self.max_batch_size),
            "--max-num-pages", str(self.max_num_pages),
            "--page-size", str(self.page_size),
            "--log-level", self.log_level,
        ]
        if self.dp_size > 1:
            argv += ["--dp-size", str(self.dp_size)]
        if self.enable_disaggregation:
            argv += ["--enable-disaggregation"]
        if self.tp_size > 1:
            argv += ["--tp-size", str(self.tp_size)]
        for flag, val in (("--top-p", self.top_p), ("--top-k", self.top_k),
                          ("--temperature", self.temperature),
                          ("--max-tokens", self.max_tokens),
                          ("--repetition-penalty", self.repetition_penalty),
                          ("--detokenize-interval", self.detokenize_interval)):
            if val is not None:
                argv += [flag, str(val)]
        if self.greedy:
            argv += ["--greedy"]
        argv += list(self.extra_args)
        return argv


@dataclasses.dataclass
class ServerStatus:
    state: str = "stopped"  # stopped | starting | running | error
    pid: int | None = None
    port: int | None = None
    model: str | None = None
    uptime_s: float = 0.0
    message: str = ""
    assets_available: bool | None = None


class ServerManager:
    def __init__(self, log_lines: int = 2000):
        self._proc: subprocess.Popen | None = None
        self._config: ServerConfig | None = None
        self._logs: collections.deque[str] = collections.deque(
            maxlen=log_lines)
        self._state = "stopped"
        self._message = ""
        self._started_at = 0.0
        self._lock = threading.Lock()
        self._log_thread: threading.Thread | None = None

    # ------------------------------------------------------------------
    @property
    def base_url(self) -> str | None:
        if self._config is None:
            return None
        return f"http://{self._config.host}:{self._config.port}"

    def _pump_logs(self, proc: subprocess.Popen) -> None:
        for line in iter(proc.stdout.readline, b""):
            self._logs.append(line.decode(errors="replace").rstrip())
        proc.stdout.close()

    def start(self, config: ServerConfig, timeout: float = 600.0,
              wait: bool = True) -> tuple[bool, str]:
        with self._lock:
            if self._proc is not None and self._proc.poll() is None:
                return False, "server already running; stop it first"
            env = os.environ.copy()
            self._logs.clear()
            try:
                self._proc = subprocess.Popen(
                    config.to_argv(), env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, start_new_session=True)
            except OSError as e:
                self._state = "error"
                self._message = str(e)
                return False, str(e)
            self._config = config
            self._state = "starting"
            self._message = "launching"
            self._started_at = time.time()
            self._log_thread = threading.Thread(
                target=self._pump_logs, args=(self._proc,), daemon=True)
            self._log_thread.start()
        if not wait:
            return True, "starting"
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self._proc.poll() is not None:
                self._state = "error"
                self._message = f"exited rc={self._proc.returncode}"
                return False, self._message
            ok, body = self._health()
            if ok:
                self._state = "running"
                self._message = "healthy"
                return True, "running"
            time.sleep(1.0)
        self._state = "error"
        self._message = "startup timeout"
        return False, "startup timeout"

    def _health(self) -> tuple[bool, dict]:
        if self.base_url is None:
            return False, {}
        try:
            import json

            with urllib.request.urlopen(self.base_url + "/health",
                                        timeout=2) as r:
                return r.status == 200, json.loads(r.read().decode())
        except Exception:
            return False, {}

    def stop(self) -> tuple[bool, str]:
        with self._lock:
            if self._proc is None or self._proc.poll() is not None:
                self._state = "stopped"
                return True, "not running"
            # signal the whole process group (scheduler daemons included)
            try:
                os.killpg(self._proc.pid, signal.SIGTERM)
            except OSError:
                self._proc.terminate()
            try:
                self._proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(self._proc.pid, signal.SIGKILL)
                except OSError:
                    self._proc.kill()
                self._proc.wait(timeout=5)
            self._state = "stopped"
            self._message = "stopped"
            return True, "stopped"

    def status(self) -> ServerStatus:
        proc = self._proc
        if proc is None:
            return ServerStatus(state="stopped")
        if proc.poll() is not None and self._state != "stopped":
            self._state = "error"
            self._message = f"exited rc={proc.returncode}"
        st = ServerStatus(
            state=self._state, pid=proc.pid if proc.poll() is None else None,
            port=self._config.port if self._config else None,
            model=self._config.model if self._config else None,
            uptime_s=round(time.time() - self._started_at, 1)
            if self._state in ("starting", "running") else 0.0,
            message=self._message)
        if self._state in ("starting", "running"):
            ok, body = self._health()
            if ok:
                st.state = self._state = "running"
                st.assets_available = body.get("assets_available", True)
        return st

    def get_logs(self, lines: int = 100) -> list[str]:
        return list(self._logs)[-lines:]


_DEVICE_CACHE: list[dict] | None = None


def get_devices() -> list[dict]:
    """Accelerator inventory (the reference playground's /api/gpus via
    nvidia-smi, server_manager.py:87-121, as a TPU/JAX device query).

    Queried in a THROWAWAY subprocess so the playground process never holds
    the TPU runtime (importing jax in-process would claim the chip the
    managed server needs). Cached after the first call — the topology does
    not change while the playground runs.
    """
    global _DEVICE_CACHE
    if _DEVICE_CACHE is not None:
        return _DEVICE_CACHE
    script = (
        "import json, jax\n"
        "out = []\n"
        "for d in jax.devices():\n"
        "    info = {'id': d.id, 'platform': d.platform,\n"
        "            'kind': getattr(d, 'device_kind', '?')}\n"
        "    try:\n"
        "        ms = d.memory_stats() or {}\n"
        "        lim = ms.get('bytes_limit'); used = ms.get('bytes_in_use')\n"
        "        if lim: info['memory_total_mb'] = round(lim / 2**20)\n"
        "        if used is not None:\n"
        "            info['memory_used_mb'] = round(used / 2**20)\n"
        "    except Exception:\n"
        "        pass\n"
        "    out.append(info)\n"
        "print(json.dumps(out))\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", script],
                              capture_output=True, timeout=120)
        import json

        line = proc.stdout.decode().strip().splitlines()[-1]
        _DEVICE_CACHE = json.loads(line)
    except Exception as e:
        return [{"error": f"device query failed: {e}"}]
    return _DEVICE_CACHE
