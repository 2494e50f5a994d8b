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
