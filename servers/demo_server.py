"""Browser demo server: SSE streaming UI backend.

Same route surface as the reference demo backend (reference
demo/server.py:768-1288): POST /generate, POST /generate/stream (SSE wav-b64
chunks with live TTFA/RTF metrics), /load (model LRU cache), /status,
/preset_ref/{id}. Auth/quota are out of scope for an on-device demo; the
concurrency model is the same global generation lock + queue-depth reporting
(reference demo/server.py:664-665, 1124-1151).

Run:  python servers/demo_server.py --models 0.6b,1.7b
"""
from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import logging
import queue
import sys
import threading
import time
from collections import OrderedDict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from aiohttp import web

logger = logging.getLogger("demo_server")

MAX_TEXT_CHARS = 1000  # KV budget guard (reference demo/server.py:668-670)
MODEL_CACHE_SIZE = 2

MODEL_IDS = {
    "0.6b": "Qwen/Qwen3-TTS-12Hz-0.6B-Base",
    "1.7b": "Qwen/Qwen3-TTS-12Hz-1.7B-Base",
    "0.6b-custom": "Qwen/Qwen3-TTS-12Hz-0.6B-CustomVoice",
    "1.7b-custom": "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
    "1.7b-design": "Qwen/Qwen3-TTS-12Hz-1.7B-VoiceDesign",
}


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


def _run_generation(model, payload: dict, out_q: queue.Queue):
    """Producer thread (reference demo/server.py:986-1122)."""
    try:
        mode = payload.get("mode", "clone")
        text = payload["text"]
        chunk_size = int(payload.get("chunk_size", 8))
        common = dict(chunk_size=chunk_size, max_new_tokens=int(payload.get("max_new_tokens", 600)))
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
            out_q.put(("chunk", audio, sr, timing))
        out_q.put(("done", None, None, None))
    except Exception as e:
        logger.exception("generation failed")
        out_q.put(("error", str(e), None, None))


async def generate_stream(request: web.Request) -> web.StreamResponse:
    global _waiters
    payload = await request.json()
    text = payload.get("text", "")
    if not text:
        raise web.HTTPBadRequest(text=json.dumps({"error": "missing text"}),
                                 content_type="application/json")
    if len(text) > MAX_TEXT_CHARS:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": f"text too long (max {MAX_TEXT_CHARS} chars)"}),
            content_type="application/json")

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
        t = threading.Thread(target=_run_generation, args=(model, payload, out_q), daemon=True)
        t.start()
        loop = asyncio.get_event_loop()
        t_start = time.perf_counter()
        total_ms = 0.0
        audio_s = 0.0
        ttfa_ms = None
        while True:
            kind, a, sr, timing = await loop.run_in_executor(None, out_q.get)
            if kind == "done":
                await sse({"type": "done", "ttfa_ms": ttfa_ms,
                           "rtf": audio_s / max(total_ms / 1000, 1e-9),
                           "audio_s": audio_s})
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
    await resp.write_eof()
    return resp


async def generate(request: web.Request) -> web.Response:
    """Non-streaming one-shot (reference demo /generate)."""
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
    payload = await request.json()
    async with _generation_lock:  # load under the generation lock
        loop = asyncio.get_event_loop()
        model = await loop.run_in_executor(
            None, _models.get, payload.get("model", "0.6b"), payload.get("quant", "BF16")
        )
        if payload.get("warmup"):
            await loop.run_in_executor(None, model.warmup)
    return web.json_response({"loaded": _models.loaded()})


async def status(request: web.Request) -> web.Response:
    return web.json_response({
        "loaded_models": _models.loaded(),
        "queue_depth": _waiters,
        "presets": sorted(_preset_refs.keys()),
        "max_text_chars": MAX_TEXT_CHARS,
    })


async def upload_ref(request: web.Request) -> web.Response:
    """Upload a reference wav -> content-addressed temp file -> ref id
    (the sha1 temp-file cache of reference demo/server.py:698-709).
    Accepts multipart (field 'file') or a raw audio/* body."""
    import hashlib
    import tempfile

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


async def index(request: web.Request) -> web.Response:
    html = (Path(__file__).parent / "index.html")
    if html.exists():
        return web.Response(text=html.read_text(), content_type="text/html")
    return web.Response(text="<h1>faster-qwen3-tts-tpu demo</h1>", content_type="text/html")


def make_app() -> web.Application:
    app = web.Application(client_max_size=32 * 1024 * 1024)
    app.router.add_get("/", index)
    app.router.add_post("/generate", generate)
    app.router.add_post("/generate/stream", generate_stream)
    app.router.add_post("/load", load_model)
    app.router.add_get("/status", status)
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
