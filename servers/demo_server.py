"""Browser demo server: SSE streaming UI backend.

Same route surface as the reference demo backend (reference
demo/server.py:768-1288): POST /generate, POST /generate/stream (SSE wav-b64
chunks with live TTFA/RTF metrics), /load (model LRU cache), /status,
/preset_ref/{id}, /transcribe, /upload_ref, plus the auth/quota surface:
optional login gating (DEMO_REQUIRE_LOGIN; identity comes from a pluggable
`_oauth_parser` hook — in production wire your IdP, e.g. an OAuth reverse
proxy, through it), a sqlite daily-quota usage DB with HMAC-pseudonymized
user keys (reference demo/server.py:371-588), and web-only mode
(DEMO_WEB_ONLY) that requires a signed page token on generation routes
(reference demo/server.py:265-331). The concurrency model is the same global
generation lock + queue-depth reporting (reference demo/server.py:664-665,
1124-1151).

Run:  python servers/demo_server.py --preload 0.6b

Cold start: set FQ3T_AOT_CACHE=<dir> to persist compiled TPU executables
across restarts (engine/aot.py) — the warmup then reloads them from disk
instead of re-paying the XLA compiles.
"""
from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import logging
import os
import queue
import sys
import threading
import time
from collections import OrderedDict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from aiohttp import web

from servers.qcommon import terminal_put
from servers.usage_db import QuotaExceeded, UsageDB, WebGate

logger = logging.getLogger("demo_server")

MAX_TEXT_CHARS = 1000  # KV budget guard (reference demo/server.py:668-670)
MODEL_CACHE_SIZE = int(os.environ.get("MODEL_CACHE_SIZE", "2"))

_ALL_MODEL_IDS = {
    "0.6b": "Qwen/Qwen3-TTS-12Hz-0.6B-Base",
    "1.7b": "Qwen/Qwen3-TTS-12Hz-1.7B-Base",
    "0.6b-custom": "Qwen/Qwen3-TTS-12Hz-0.6B-CustomVoice",
    "1.7b-custom": "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
    "1.7b-design": "Qwen/Qwen3-TTS-12Hz-1.7B-VoiceDesign",
}
_active_env = os.environ.get("ACTIVE_MODELS", "")
if _active_env:  # restrict servable models (reference demo/server.py:72-77)
    _allowed = {m.strip() for m in _active_env.split(",") if m.strip()}
    MODEL_IDS = {k: v for k, v in _ALL_MODEL_IDS.items() if k in _allowed or v in _allowed}
else:
    MODEL_IDS = dict(_ALL_MODEL_IDS)


def _env_flag(name: str, default: str = "0") -> bool:
    return os.environ.get(name, default).strip().lower() not in {"0", "false", "no", "off", ""}


# --- auth / quota configuration (reference demo/server.py:212-236) ----------
WEB_ONLY_MODE = _env_flag("DEMO_WEB_ONLY", "0")
REQUIRE_LOGIN = _env_flag("DEMO_REQUIRE_LOGIN", "1" if WEB_ONLY_MODE else "0")
WEB_TOKEN_HEADER = "x-fq3t-web-token"
DAILY_FREE_REQUESTS = int(os.environ.get("DEMO_DAILY_FREE_REQUESTS", "10"))
_gate_secret = os.environ.get("DEMO_WEB_GATE_SECRET")
_usage_secret = os.environ.get("DEMO_USAGE_HASH_SECRET") or _gate_secret
_USAGE_DB_PATH = os.environ.get("USAGE_DB_PATH", "/tmp/fq3t-demo-usage.sqlite3")
_web_gate = WebGate(
    _gate_secret.encode() if _gate_secret else None,
    ttl_seconds=int(os.environ.get("DEMO_WEB_TOKEN_TTL_SECONDS", "7200")),
)


def _stable_usage_secret() -> bytes:
    """Pseudonym HMAC key when no explicit secret is configured.

    A per-process random key would re-pseudonymize every user on restart —
    daily quotas silently reset and usage_users fills with unlinkable rows
    (ADVICE r2). Persist a generated key next to the sqlite file instead so
    pseudonyms are stable across restarts; explicit env secrets still win.
    """
    if _usage_secret:
        return _usage_secret.encode()
    path = _USAGE_DB_PATH + ".hmac-key"
    try:
        with open(path, "rb") as f:
            key = f.read()
        if key:
            return key
    except FileNotFoundError:
        pass
    key = _web_gate.secret
    try:
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
        with os.fdopen(fd, "wb") as f:
            f.write(key)
        os.replace(tmp, path)
        os.chmod(path, 0o600)
    except OSError:
        logger.warning("could not persist usage HMAC key at %s; pseudonyms "
                       "will rotate on restart", path)
    return key


_usage_db = UsageDB(
    _USAGE_DB_PATH,
    hash_secret=_stable_usage_secret(),
    daily_free_limit=DAILY_FREE_REQUESTS,
)

# Pluggable identity hook: (request) -> {"sub": str, "username": str,
# "is_pro": bool} or None. The reference gets this from the HF Spaces OAuth
# middleware (demo/server.py:326-366); deployments wire their IdP here.
_oauth_parser = None


def _request_user(request: web.Request):
    if _oauth_parser is not None:
        return _oauth_parser(request)
    return None


def _client_fingerprint(request: web.Request) -> str:
    fwd = request.headers.get("x-forwarded-for", "")
    ip = fwd.split(",", 1)[0].strip() if fwd else (request.remote or "")
    return f"{ip}|{request.headers.get('user-agent', '')[:256]}"


def _require_user(request: web.Request):
    """401 unless logged in (when DEMO_REQUIRE_LOGIN). Returns the user."""
    if not REQUIRE_LOGIN:
        return None
    user = _request_user(request)
    if not user or not user.get("sub"):
        raise web.HTTPUnauthorized(
            text=json.dumps({"error": "Sign in to use this demo."}),
            content_type="application/json",
        )
    return user


def _require_web_client(request: web.Request) -> None:
    """Web-only mode: generation routes need the signed page token
    (reference demo/server.py:311-323)."""
    if not WEB_ONLY_MODE:
        return
    fetch_site = request.headers.get("sec-fetch-site")
    if fetch_site and fetch_site not in {"same-origin", "same-site", "none"}:
        raise web.HTTPForbidden(
            text=json.dumps({"error": "Use the web UI to run this demo."}),
            content_type="application/json",
        )
    token = request.headers.get(WEB_TOKEN_HEADER, "")
    if not _web_gate.verify(token, _client_fingerprint(request)):
        raise web.HTTPForbidden(
            text=json.dumps({"error": "Open the demo page before making requests."}),
            content_type="application/json",
        )


def _consume_quota(user) -> "dict | None":
    """Consume one generation from the user's daily quota; 429 when out."""
    if not REQUIRE_LOGIN or user is None:
        return None
    try:
        return _usage_db.consume(user["sub"], user.get("username", ""), bool(user.get("is_pro")))
    except QuotaExceeded as e:
        raise web.HTTPTooManyRequests(
            text=json.dumps({"error": str(e)}), content_type="application/json"
        )


class ModelCache:
    """LRU of loaded engines (reference demo/server.py:738-760)."""

    def __init__(self, limit: int = MODEL_CACHE_SIZE):
        self.limit = limit
        self._cache: OrderedDict = OrderedDict()

    def get(self, key: str, quant: str):
        k = (key, quant)
        if k in self._cache:
            self._cache.move_to_end(k)
            return self._cache[k]
        from faster_qwen3_tts_tpu.model import FasterQwen3TTS

        model = FasterQwen3TTS.from_pretrained(MODEL_IDS.get(key, key), quant=quant)
        self._cache[k] = model
        while len(self._cache) > self.limit:
            self._cache.popitem(last=False)
        return model

    def loaded(self):
        return [f"{k[0]} ({k[1]})" for k in self._cache]


_models = ModelCache()
_generation_lock = asyncio.Lock()
_waiters = 0
_preset_refs: dict = {}
_uploaded_refs: dict = {}  # sha1 -> temp wav path (reference demo/server.py:698-709)
_transcriber = None  # pluggable ASR callable: (path) -> str


def _wav_b64(audio: np.ndarray, sr: int) -> str:
    buf = io.BytesIO()
    import wave

    pcm16 = (np.clip(audio, -1, 1) * 32767.0).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def _run_generation(model, payload: dict, out_q: queue.Queue,
                    cancelled: threading.Event):
    """Producer thread (reference demo/server.py:986-1122).

    `cancelled` is set when the SSE consumer goes away (closed tab); the
    producer then stops instead of blocking on the bounded queue forever —
    which would leak a thread still generating after the generation lock was
    released."""
    terminal = ("done", None, None, None)
    try:
        mode = payload.get("mode", "clone")
        text = payload["text"]
        chunk_size = int(payload.get("chunk_size", 8))
        common = dict(chunk_size=chunk_size, max_new_tokens=int(payload.get("max_new_tokens", 600)),
                      first_chunk_size=min(4, chunk_size))
        if mode == "custom":
            gen = model.generate_custom_voice_streaming(
                text, speaker=payload["speaker"], language=payload.get("language", "English"),
                instruct=payload.get("instruct"), **common)
        elif mode == "design":
            gen = model.generate_voice_design_streaming(
                text, instruct=payload["instruct"], language=payload.get("language", "English"),
                **common)
        else:
            vcp = None
            preset = payload.get("preset_ref")
            if preset and preset in _preset_refs:
                vcp = _preset_refs[preset]
            ref_audio = payload.get("ref_audio")
            uploaded = payload.get("uploaded_ref")
            if uploaded:
                if uploaded not in _uploaded_refs:
                    raise ValueError(f"unknown uploaded_ref {uploaded!r}")
                ref_audio = _uploaded_refs[uploaded]
            gen = model.generate_voice_clone_streaming(
                text, payload.get("language", "English"),
                ref_audio=ref_audio,
                ref_text=payload.get("ref_text", ""),
                xvec_only=bool(payload.get("xvec_only", False)),
                voice_clone_prompt=vcp, **common)
        for audio, sr, timing in gen:
            if cancelled.is_set():
                return
            try:
                out_q.put(("chunk", audio, sr, timing), timeout=30)
            except queue.Full:
                return
        terminal = ("done", None, None, None)
    except Exception as e:
        logger.exception("generation failed")
        terminal = ("error", str(e), None, None)
    finally:
        # Always lands, never blocks (evicts a stale chunk if full) — the
        # consumer's blocking get() must wake even after a cancel/overflow,
        # and the producer must always exit so t.join() returns.
        terminal_put(out_q, terminal)


async def generate_stream(request: web.Request) -> web.StreamResponse:
    global _waiters
    user = _require_user(request)
    _require_web_client(request)
    payload = await request.json()
    text = payload.get("text", "")
    if not text:
        raise web.HTTPBadRequest(text=json.dumps({"error": "missing text"}),
                                 content_type="application/json")
    if len(text) > MAX_TEXT_CHARS:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": f"text too long (max {MAX_TEXT_CHARS} chars)"}),
            content_type="application/json")
    # chunk_size is a compile-shape key (each distinct value = a fresh remote
    # XLA compile); only the warmed sizes are accepted.
    try:
        _cs = int(payload.get("chunk_size", 8))
    except (TypeError, ValueError):
        _cs = -1
    if _cs not in (4, 8, 12):
        raise web.HTTPBadRequest(
            text=json.dumps({"error": "chunk_size must be one of [4, 8, 12]"}),
            content_type="application/json")
    # Consume quota only after the payload validates: a 400 must not burn a
    # free-tier unit (ADVICE r2).
    usage = _consume_quota(user)

    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
    })
    await resp.prepare(request)

    async def sse(obj):
        await resp.write(f"data: {json.dumps(obj)}\n\n".encode())

    _waiters += 1
    await sse({"type": "queued", "position": _waiters - 1})
    async with _generation_lock:
        _waiters -= 1
        model = _models.get(payload.get("model", "0.6b"), payload.get("quant", "BF16"))
        out_q: queue.Queue = queue.Queue(maxsize=16)
        cancelled = threading.Event()
        t = threading.Thread(target=_run_generation,
                             args=(model, payload, out_q, cancelled), daemon=True)
        t.start()
        loop = asyncio.get_event_loop()
        t_start = time.perf_counter()
        total_ms = 0.0
        audio_s = 0.0
        ttfa_ms = None
        try:
            while True:
                kind, a, sr, timing = await loop.run_in_executor(None, out_q.get)
                if kind == "done":
                    await sse({"type": "done", "ttfa_ms": ttfa_ms,
                               "rtf": audio_s / max(total_ms / 1000, 1e-9),
                               "audio_s": audio_s, "usage": usage})
                    break
                if kind == "error":
                    await sse({"type": "error", "message": a})
                    break
                if ttfa_ms is None:
                    ttfa_ms = (time.perf_counter() - t_start) * 1000
                total_ms += timing.get("prefill_ms", 0) + timing.get("decode_ms", 0)
                audio_s += len(a) / sr
                await sse({
                    "type": "chunk",
                    "chunk_index": timing["chunk_index"],
                    "wav_b64": _wav_b64(a, sr),
                    "ttfa_ms": ttfa_ms,
                    "rtf": audio_s / max(total_ms / 1000, 1e-9),
                })
        finally:
            cancelled.set()
            # keep the generation lock until the producer actually stops
            await loop.run_in_executor(None, t.join)
    await resp.write_eof()
    return resp


async def generate(request: web.Request) -> web.Response:
    """Non-streaming one-shot (reference demo /generate)."""
    user = _require_user(request)
    _require_web_client(request)
    _consume_quota(user)
    payload = await request.json()
    async with _generation_lock:
        model = _models.get(payload.get("model", "0.6b"), payload.get("quant", "BF16"))
        loop = asyncio.get_event_loop()

        def run():
            return model.generate_voice_clone(
                payload["text"], payload.get("language", "English"),
                ref_audio=payload.get("ref_audio"),
                ref_text=payload.get("ref_text", ""),
                xvec_only=bool(payload.get("xvec_only", False)),
                max_new_tokens=int(payload.get("max_new_tokens", 600)),
            )

        audio, sr = await loop.run_in_executor(None, run)
    return web.json_response({"wav_b64": _wav_b64(audio[0], sr), "sample_rate": sr})


async def load_model(request: web.Request) -> web.Response:
    _require_user(request)
    _require_web_client(request)
    payload = await request.json()
    if payload.get("model", "0.6b") not in MODEL_IDS:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": f"model not in ACTIVE_MODELS: {sorted(MODEL_IDS)}"}),
            content_type="application/json",
        )
    async with _generation_lock:  # load under the generation lock
        loop = asyncio.get_event_loop()
        model = await loop.run_in_executor(
            None, _models.get, payload.get("model", "0.6b"), payload.get("quant", "BF16")
        )
        if payload.get("warmup"):
            # Serving config (chunk 8 + 4-frame first chunk, _run_generation
            # defaults): warm those executables, not the bare defaults.
            await loop.run_in_executor(
                None, lambda: model.warmup(chunk_sizes=(8,), first_chunk_size=4)
            )
    return web.json_response({"loaded": _models.loaded()})


async def status(request: web.Request) -> web.Response:
    user = _require_user(request)
    usage = None
    if REQUIRE_LOGIN and user is not None:
        usage = _usage_db.get_usage(
            user["sub"], user.get("username", ""), bool(user.get("is_pro"))
        )
    return web.json_response({
        "loaded_models": _models.loaded(),
        "available_models": sorted(MODEL_IDS),
        "queue_depth": _waiters,
        "presets": sorted(_preset_refs.keys()),
        "max_text_chars": MAX_TEXT_CHARS,
        "require_login": REQUIRE_LOGIN,
        "web_only": WEB_ONLY_MODE,
        "user": ({"username": user.get("username", ""), "is_pro": bool(user.get("is_pro"))}
                 if user else None),
        "usage": usage,
    })


async def upload_ref(request: web.Request) -> web.Response:
    """Upload a reference wav -> content-addressed temp file -> ref id
    (the sha1 temp-file cache of reference demo/server.py:698-709).
    Accepts multipart (field 'file') or a raw audio/* body."""
    import hashlib
    import tempfile

    _require_user(request)
    _require_web_client(request)

    if request.content_type and request.content_type.startswith("multipart/"):
        reader = await request.multipart()
        part = await reader.next()
        data = bytearray()
        while True:
            chunk = await part.read_chunk()
            if not chunk:
                break
            data.extend(chunk)
        data = bytes(data)
    else:
        data = await request.read()
    if not data:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": "empty upload"}), content_type="application/json"
        )
    if len(data) > 16 * 1024 * 1024:
        raise web.HTTPRequestEntityTooLarge(max_size=16 * 1024 * 1024, actual_size=len(data))
    sha = hashlib.sha1(data).hexdigest()
    if sha not in _uploaded_refs:
        path = Path(tempfile.gettempdir()) / f"fq3t_ref_{sha}.wav"
        path.write_bytes(data)
        _uploaded_refs[sha] = str(path)
    return web.json_response({"ref_id": sha})


async def preset_ref(request: web.Request) -> web.Response:
    """Serve a preset reference wav (reference demo /preset_ref/{id})."""
    rid = request.match_info["rid"]
    entry = _preset_refs.get(rid)
    path = entry.get("ref_audio") if isinstance(entry, dict) else None
    if not path or not Path(path).exists():
        raise web.HTTPNotFound(
            text=json.dumps({"error": f"unknown preset {rid!r}"}),
            content_type="application/json",
        )
    return web.FileResponse(path)


async def transcribe(request: web.Request) -> web.Response:
    """ASR of an uploaded reference (reference demo /transcribe runs an ASR
    model on the GPU). No ASR model ships in this image; the route exists
    with a pluggable hook (set demo_server._transcriber) and otherwise
    returns 501 with a clear message."""
    _require_user(request)
    _require_web_client(request)
    payload = await request.json()
    rid = payload.get("ref_id")
    path = _uploaded_refs.get(rid)
    if path is None:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": f"unknown ref_id {rid!r}"}),
            content_type="application/json",
        )
    if _transcriber is None:
        raise web.HTTPNotImplemented(
            text=json.dumps({
                "error": "no ASR model configured; set demo_server._transcriber "
                "or type the reference text manually"
            }),
            content_type="application/json",
        )
    loop = asyncio.get_event_loop()
    text = await loop.run_in_executor(None, _transcriber, path)
    return web.json_response({"text": text})


_LOGIN_PAGE = """<!doctype html><html><head><title>faster-qwen3-tts-tpu demo</title>
</head><body style="font-family:sans-serif;max-width:28rem;margin:4rem auto">
<h1>Sign in required</h1>
<p>This demo requires login. Configure your identity provider (see
servers/demo_server.py `_oauth_parser`) or start the server without
DEMO_REQUIRE_LOGIN.</p></body></html>"""


async def index(request: web.Request) -> web.Response:
    if REQUIRE_LOGIN and _request_user(request) is None:
        # login splash (reference demo/server.py:768-772, 599-637)
        return web.Response(text=_LOGIN_PAGE, content_type="text/html")
    html_path = Path(__file__).parent / "index.html"
    if not html_path.exists():
        return web.Response(text="<h1>faster-qwen3-tts-tpu demo</h1>", content_type="text/html")
    html = html_path.read_text()
    if WEB_ONLY_MODE:
        # bootstrap the signed page token (reference demo/server.py:774-781)
        token = _web_gate.make_token(_client_fingerprint(request))
        boot = f"<script>window.__FQ3T_WEB_TOKEN__ = {json.dumps(token)};</script>"
        html = html.replace("</head>", f"{boot}\n</head>", 1)
        return web.Response(text=html, content_type="text/html",
                            headers={"Cache-Control": "no-store"})
    return web.Response(text=html, content_type="text/html")


async def favicon(request: web.Request) -> web.Response:
    return web.Response(status=204)


async def usage(request: web.Request) -> web.Response:
    user = _require_user(request)
    if user is None:
        return web.json_response({"usage": None})
    return web.json_response(
        {"usage": _usage_db.get_usage(user["sub"], user.get("username", ""),
                                      bool(user.get("is_pro")))}
    )


def make_app() -> web.Application:
    app = web.Application(client_max_size=32 * 1024 * 1024)
    app.router.add_get("/", index)
    app.router.add_get("/favicon.ico", favicon)
    app.router.add_post("/generate", generate)
    app.router.add_post("/generate/stream", generate_stream)
    app.router.add_post("/load", load_model)
    app.router.add_get("/status", status)
    app.router.add_get("/usage", usage)
    app.router.add_post("/upload_ref", upload_ref)
    app.router.add_get("/preset_ref/{rid}", preset_ref)
    app.router.add_post("/transcribe", transcribe)
    return app


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--preload", default=None, help="model key to preload, e.g. 0.6b")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.preload:
        _models.get(args.preload, "BF16")
    web.run_app(make_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
