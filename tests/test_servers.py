"""Server route tests with a stub engine (no model load, no device).

Mirrors the reference's fake-runtime server-adjacent coverage: route
contracts, error paths, and the streaming bridge, using aiohttp's test
utilities.
"""
import asyncio
import json

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


class _StubModel:
    sample_rate = 24000

    def generate_voice_clone_streaming(self, text, language, **kw):
        chunk = kw.get("chunk_size", 8)
        for i in range(3):
            yield (
                np.zeros(chunk * 1920, np.float32),
                self.sample_rate,
                {"chunk_index": i, "chunk_steps": chunk, "prefill_ms": 5.0 if i == 0 else 0.0,
                 "decode_ms": 10.0, "total_steps_so_far": (i + 1) * chunk,
                 "is_final": i == 2},
            )

    def generate_voice_clone(self, text, language, **kw):
        return [np.zeros(1920, np.float32)], self.sample_rate


@pytest.fixture
def oai_app(monkeypatch):
    import servers.openai_server as srv

    monkeypatch.setattr(srv, "_model", _StubModel())
    monkeypatch.setattr(srv, "_voices", {"alloy": {"ref_audio": None, "xvec_only": True}})
    return srv.make_app()


def test_openai_speech_wav(oai_app):
    run(_openai_speech_wav(oai_app))


async def _openai_speech_wav(oai_app):
    async with TestClient(TestServer(oai_app)) as client:
        resp = await client.post(
            "/v1/audio/speech", json={"input": "hi", "voice": "alloy"}
        )
        assert resp.status == 200
        body = await resp.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        assert len(body) > 44

        health = await (await client.get("/health")).json()
        assert health["status"] == "ok" and health["voices"] == ["alloy"]


def test_openai_errors(oai_app):
    run(_openai_errors(oai_app))


async def _openai_errors(oai_app):
    async with TestClient(TestServer(oai_app)) as client:
        r = await client.post("/v1/audio/speech", json={"voice": "alloy"})
        assert r.status == 400 and "input" in (await r.json())["error"]
        r = await client.post(
            "/v1/audio/speech", json={"input": "x", "response_format": "ogg"}
        )
        assert r.status == 400


def test_demo_stream_and_guards(monkeypatch):
    import servers.demo_server as demo

    class _Cache:
        def get(self, key, quant):
            return _StubModel()

        def loaded(self):
            return ["stub"]

    monkeypatch.setattr(demo, "_models", _Cache())
    app = demo.make_app()

    async def body():
        async with TestClient(TestServer(app)) as client:
            await _demo_checks(client)

    run(body())


async def _demo_checks(client):
    if True:
        r = await client.post(
            "/generate/stream",
            json={"text": "hello", "mode": "clone", "xvec_only": True},
        )
        assert r.status == 200
        body = (await r.read()).decode()
        events = [json.loads(l[6:]) for l in body.splitlines() if l.startswith("data: ")]
        kinds = [e["type"] for e in events]
        assert kinds[0] == "queued" and kinds[-1] == "done"
        assert "chunk" in kinds
        # guard: too-long text
        r = await client.post("/generate/stream", json={"text": "x" * 1500})
        assert r.status == 400
        # status route
        st = await (await client.get("/status")).json()
        assert "queue_depth" in st


def test_openai_mp3(oai_app, monkeypatch):
    """mp3 route (reference openai_server.py:242-256): stub a lameenc module
    (the reference's Tier-B sys.modules fake pattern) and check the encode
    path; then remove all encoders and expect 501."""
    import sys
    import types

    class _FakeEnc:
        def set_bit_rate(self, b): self.b = b
        def set_in_sample_rate(self, s): self.s = s
        def set_channels(self, c): self.c = c
        def set_quality(self, q): self.q = q
        def encode(self, pcm): return b"MP3" + bytes([len(pcm) % 251])
        def flush(self): return b"END"

    import servers.openai_server as srv

    fake = types.ModuleType("lameenc")
    fake.Encoder = _FakeEnc
    monkeypatch.setitem(sys.modules, "lameenc", fake)
    run(_openai_mp3_ok(oai_app))

    monkeypatch.delitem(sys.modules, "lameenc")
    monkeypatch.setitem(sys.modules, "pydub", None)  # force ImportError
    monkeypatch.setitem(sys.modules, "lameenc", None)
    # a fresh app: aiohttp apps are bound to one event loop per run()
    run(_openai_mp3_unavailable(srv.make_app()))


async def _openai_mp3_ok(oai_app):
    async with TestClient(TestServer(oai_app)) as client:
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "hi", "voice": "alloy", "response_format": "mp3"},
        )
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/mpeg"
        body = await r.read()
        assert body.startswith(b"MP3") and body.endswith(b"END")


async def _openai_mp3_unavailable(oai_app):
    async with TestClient(TestServer(oai_app)) as client:
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "hi", "voice": "alloy", "response_format": "mp3"},
        )
        assert r.status == 501
        assert "encoder" in (await r.json())["error"]


def test_demo_upload_and_transcribe(monkeypatch, tmp_path):
    """upload_ref -> content-addressed id; clone via uploaded_ref; transcribe
    gated 501 without an ASR hook, 200 with one (reference demo
    /transcribe + sha1 upload cache, server.py:698-709)."""
    import servers.demo_server as demo

    captured = {}

    class _RefStub(_StubModel):
        def generate_voice_clone_streaming(self, text, language, **kw):
            captured.update(kw)
            yield from _StubModel.generate_voice_clone_streaming(self, text, language, **kw)

    class _Cache:
        def get(self, key, quant):
            return _RefStub()

        def loaded(self):
            return ["stub"]

    monkeypatch.setattr(demo, "_models", _Cache())
    monkeypatch.setattr(demo, "_uploaded_refs", {})
    app = demo.make_app()

    async def body():
        async with TestClient(TestServer(app)) as client:
            wav = b"RIFF" + b"\x00" * 256
            r = await client.post("/upload_ref", data=wav,
                                  headers={"Content-Type": "audio/wav"})
            assert r.status == 200
            rid = (await r.json())["ref_id"]
            # identical content -> same id (content addressed)
            r2 = await client.post("/upload_ref", data=wav,
                                   headers={"Content-Type": "audio/wav"})
            assert (await r2.json())["ref_id"] == rid

            # clone via uploaded_ref plumbs the temp path into ref_audio
            r = await client.post("/generate/stream",
                                  json={"text": "hi", "mode": "clone",
                                        "uploaded_ref": rid})
            assert r.status == 200
            assert captured["ref_audio"] == demo._uploaded_refs[rid]

            # unknown uploaded_ref -> error event in stream
            r = await client.post("/generate/stream",
                                  json={"text": "hi", "mode": "clone",
                                        "uploaded_ref": "nope"})
            events = [json.loads(l[6:]) for l in (await r.read()).decode().splitlines()
                      if l.startswith("data: ")]
            assert any(e["type"] == "error" for e in events)

            # transcribe: 501 without hook
            r = await client.post("/transcribe", json={"ref_id": rid})
            assert r.status == 501
            # with hook
            monkeypatch.setattr(demo, "_transcriber", lambda path: "spoken words")
            r = await client.post("/transcribe", json={"ref_id": rid})
            assert r.status == 200 and (await r.json())["text"] == "spoken words"
            # bad ref id
            r = await client.post("/transcribe", json={"ref_id": "zz"})
            assert r.status == 400

    run(body())
