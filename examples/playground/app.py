"""vox_serve_tpu Playground — aiohttp backend + single-page UI.

TPU-native analogue of the reference playground (reference
examples/playground/app.py): manage a vox_serve_tpu server's lifecycle from
a browser, tail its logs, and generate/stream audio through a proxy (so the
UI is same-origin). Uses aiohttp like the framework's own API server.

Run:  python examples/playground/app.py --port 7860
"""

from __future__ import annotations

import argparse
import asyncio
import sys
from pathlib import Path

import aiohttp
from aiohttp import web

sys.path.insert(0, str(Path(__file__).parent))
from server_manager import ServerConfig, ServerManager  # noqa: E402

BASE_DIR = Path(__file__).parent

#: id -> capability flags the UI uses to show/hide input fields (reference
#: examples/playground/app.py:141-216 ModelInfo table).
MODELS = {
    "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice": dict(
        supports_language=True, supports_speaker=True, supports_instruct=True),
    "Qwen/Qwen3-TTS-12Hz-1.7B-Base": dict(
        supports_audio_input=True, supports_language=True,
        supports_ref_text=True, supports_instruct=True),
    "Qwen/Qwen3-TTS-12Hz-1.7B-VoiceDesign": dict(
        supports_language=True, supports_instruct=True),
    "Qwen/Qwen3-TTS-12Hz-0.6B-CustomVoice": dict(
        supports_language=True, supports_speaker=True),
    "Qwen/Qwen3-TTS-12Hz-0.6B-Base": dict(
        supports_audio_input=True, supports_language=True,
        supports_ref_text=True),
    "canopylabs/orpheus-3b-0.1-ft": dict(supports_audio_input=True),
    "sesame/csm-1b": dict(),
    "Zyphra/Zonos-v0.1-transformer": dict(),
    "zai-org/glm-4-voice-9b": dict(supports_audio_input=True,
                                   requires_audio=True),
    "stepfun-ai/Step-Audio-2-mini": dict(supports_audio_input=True,
                                         requires_audio=True),
    "ResembleAI/chatterbox": dict(supports_audio_input=True,
                                  requires_audio=True),
    "FunAudioLLM/CosyVoice2-0.5B": dict(supports_audio_input=True),
    "dummy": dict(),
}

manager = ServerManager()


async def index(request: web.Request) -> web.Response:
    html = (BASE_DIR / "templates" / "index.html").read_text()
    return web.Response(text=html, content_type="text/html")


async def models(request: web.Request) -> web.Response:
    caps = ("supports_audio_input", "requires_audio", "supports_language",
            "supports_speaker", "supports_ref_text", "supports_instruct")
    return web.json_response({"models": [
        {"id": mid, "name": mid, **{c: f.get(c, False) for c in caps}}
        for mid, f in MODELS.items()]})


async def devices(request: web.Request) -> web.Response:
    """Accelerator inventory (reference /api/gpus analogue)."""
    import server_manager as sm

    devs = await asyncio.get_running_loop().run_in_executor(
        None, sm.get_devices)
    return web.json_response({"devices": devs})


async def profiles(request: web.Request) -> web.Response:
    """Tuned serving profiles launch.py applies per model (the measured
    production operating points, vox_serve_tpu/profiles.py)."""
    sys.path.insert(0, str(BASE_DIR.parent.parent))
    from vox_serve_tpu.profiles import DEFAULT_PROFILE, SERVING_PROFILES

    return web.json_response({"default": DEFAULT_PROFILE,
                              "profiles": SERVING_PROFILES})


async def server_start(request: web.Request) -> web.Response:
    body = await request.json()
    fields = ServerConfig.__dataclass_fields__
    cfg = ServerConfig(**{k: v for k, v in body.items()
                          if k in fields and v is not None})
    loop = asyncio.get_running_loop()
    ok, msg = await loop.run_in_executor(
        None, lambda: manager.start(cfg, wait=False))
    return web.json_response({"success": ok, "message": msg},
                             status=200 if ok else 409)


async def server_stop(request: web.Request) -> web.Response:
    ok, msg = await asyncio.get_running_loop().run_in_executor(
        None, manager.stop)
    return web.json_response({"success": ok, "message": msg})


async def server_status(request: web.Request) -> web.Response:
    st = await asyncio.get_running_loop().run_in_executor(
        None, manager.status)
    return web.json_response({
        "state": st.state, "pid": st.pid, "port": st.port,
        "model": st.model, "uptime_s": st.uptime_s, "message": st.message,
        "assets_available": st.assets_available,
    })


async def server_logs(request: web.Request) -> web.Response:
    lines = int(request.query.get("lines", "200"))
    return web.json_response({"logs": manager.get_logs(lines)})


async def generate_proxy(request: web.Request) -> web.StreamResponse:
    """Forward a multipart /generate to the managed server and stream the
    WAV back (same-origin for the browser)."""
    if manager.base_url is None:
        return web.json_response({"error": "server not running"}, status=409)
    reader = await request.multipart()
    form = aiohttp.FormData()
    while True:
        part = await reader.next()
        if part is None:
            break
        if part.filename:
            form.add_field(part.name, await part.read(),
                           filename=part.filename,
                           content_type=part.headers.get(
                               "Content-Type", "application/octet-stream"))
        else:
            form.add_field(part.name, (await part.read()).decode())

    resp = web.StreamResponse()
    resp.content_type = "audio/wav"
    async with aiohttp.ClientSession() as session:
        async with session.post(manager.base_url + "/generate",
                                data=form) as upstream:
            if upstream.status != 200:
                detail = await upstream.text()
                return web.json_response(
                    {"error": detail[:500]}, status=upstream.status)
            await resp.prepare(request)
            async for chunk in upstream.content.iter_chunked(8192):
                await resp.write(chunk)
    await resp.write_eof()
    return resp


async def stream_proxy(request: web.Request) -> web.StreamResponse:
    """Generic proxy for the input-streaming endpoints."""
    if manager.base_url is None:
        return web.json_response({"error": "server not running"}, status=409)
    path = "/" + request.match_info["path"]
    url = manager.base_url + path
    async with aiohttp.ClientSession() as session:
        if request.method == "POST":
            data = await request.read()
            async with session.post(
                    url, data=data,
                    headers={"Content-Type": request.headers.get(
                        "Content-Type", "application/json")}) as upstream:
                body = await upstream.read()
                return web.Response(body=body, status=upstream.status,
                                    content_type=upstream.content_type)
        resp = web.StreamResponse()
        async with session.get(url) as upstream:
            resp.content_type = upstream.content_type or "audio/wav"
            await resp.prepare(request)
            async for chunk in upstream.content.iter_chunked(8192):
                await resp.write(chunk)
        await resp.write_eof()
        return resp


def build_app() -> web.Application:
    app = web.Application(client_max_size=64 * 1024 * 1024)
    app.router.add_get("/", index)
    app.router.add_get("/api/models", models)
    app.router.add_get("/api/devices", devices)
    app.router.add_get("/api/profiles", profiles)
    app.router.add_post("/api/server/start", server_start)
    app.router.add_post("/api/server/stop", server_stop)
    app.router.add_get("/api/server/status", server_status)
    app.router.add_get("/api/server/logs", server_logs)
    app.router.add_post("/api/generate", generate_proxy)
    app.router.add_route("*", "/api/proxy/{path:.*}", stream_proxy)
    return app


def main() -> None:
    ap = argparse.ArgumentParser(description="vox_serve_tpu playground")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    web.run_app(build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
