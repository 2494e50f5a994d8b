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
        # chunk_size is a compile-shape key: values outside the warmed set
        # (and non-integers) must 400 instead of triggering a fresh compile
        for bad in (5, 0, -8, "big", None):
            r = await client.post(
                "/v1/audio/speech",
                json={"input": "x", "voice": "alloy", "chunk_size": bad},
            )
            assert r.status == 400, bad
        # warmed values pass validation and stream
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "x", "voice": "alloy", "chunk_size": 4,
                  "response_format": "pcm"},
        )
        assert r.status == 200 and len(await r.read()) > 0


class _StubBatchModel(_StubModel):
    """Records every batched call; yields 2 chunks per slot, interleaved."""

    def __init__(self):
        self.batch_calls = []

    def generate_voice_clone_streaming_batch(self, requests, chunk_size=8, **kw):
        self.batch_calls.append([dict(r) for r in requests])
        B = len(requests)
        for i in range(2):
            for s in range(B):
                yield (
                    s,
                    np.full(chunk_size * 1920, 0.01 * (s + 1), np.float32),
                    self.sample_rate,
                    {"chunk_index": i, "slot": s, "is_final": i == 1},
                )


def test_openai_batched_serving(monkeypatch):
    """--batch mode: concurrent requests coalesce into ONE lockstep engine
    batch (the dp-batched serving the reference lacks — its requests queue
    behind a mutex, reference openai_server.py:71), and each response gets
    exactly its own slot's audio."""
    import servers.openai_server as srv

    stub = _StubBatchModel()
    monkeypatch.setattr(srv, "_model", stub)
    monkeypatch.setattr(srv, "_voices", {"alloy": {"ref_audio": None, "xvec_only": True}})
    # long window so two test requests land in the same batch round
    monkeypatch.setattr(srv, "_scheduler", srv.BatchScheduler(stub, 4, 0.5))
    app = srv.make_app()

    async def drive():
        async with TestClient(TestServer(app)) as client:
            r1, r2 = await asyncio.gather(
                client.post("/v1/audio/speech",
                            json={"input": "first", "voice": "alloy"}),
                client.post("/v1/audio/speech",
                            json={"input": "second", "voice": "alloy",
                                  "response_format": "pcm"}),
            )
            assert r1.status == 200 and r2.status == 200
            b1, b2 = await r1.read(), await r2.read()
            health = await (await client.get("/health")).json()
            return b1, b2, health

    b1, b2, health = run(drive())
    assert health["batched"] and health["max_batch"] == 4

    # exactly one engine call served both requests
    assert len(stub.batch_calls) == 1
    texts = [r["text"] for r in stub.batch_calls[0]]
    assert set(texts[:2]) == {"first", "second"}
    # pow2 padding replicates slot 0 (2 real -> bucket 2, no padding here)
    assert len(texts) == 2

    # each response carries its own slot's audio (slot s emits 0.01*(s+1))
    assert b1[:4] == b"RIFF"
    pcm1 = np.frombuffer(b1[44:], np.int16)
    pcm2 = np.frombuffer(b2, np.int16)
    from faster_qwen3_tts_tpu.utils.audio import float_to_pcm16

    slot1 = 0 if texts[0] == "first" else 1
    exp1 = np.frombuffer(
        float_to_pcm16(np.full(1, 0.01 * (slot1 + 1), np.float32)), np.int16)[0]
    exp2 = np.frombuffer(
        float_to_pcm16(np.full(1, 0.01 * (2 - slot1), np.float32)), np.int16)[0]
    assert pcm1.size == 2 * 8 * 1920 and pcm2.size == 2 * 8 * 1920
    assert int(pcm1[0]) == exp1 and int(pcm2[0]) == exp2


def test_batch_cancelled_slot_never_wedges_scheduler(monkeypatch):
    """A consumer that goes away (disconnect) must not block the scheduler:
    its slot's chunks are dropped and the other slots stream normally."""
    import servers.openai_server as srv

    stub = _StubBatchModel()
    monkeypatch.setattr(srv, "_model", stub)
    sched = srv.BatchScheduler.__new__(srv.BatchScheduler)  # no thread
    sched.model = stub
    sched.max_batch = 4
    j_ok = srv._BatchJob({"text": "alive"}, 8)
    j_dead = srv._BatchJob({"text": "gone"}, 8)
    j_dead.cancelled = True
    sched._run([j_ok, j_dead])
    # alive slot: 2 chunks then the terminal None
    items = [j_ok.out_q.get_nowait() for _ in range(3)]
    assert items[-1] is None and all(isinstance(b, bytes) for b in items[:2])
    # cancelled slot: no audio chunks delivered, but a terminal None DOES
    # land so an executor thread parked in out_q.get() always wakes up
    drained = []
    while not j_dead.out_q.empty():
        drained.append(j_dead.out_q.get_nowait())
    assert drained and all(d is None for d in drained)


def test_openai_batch_pads_to_pow2(monkeypatch):
    """3 concurrent requests pad to the pow2 bucket (4) by replicating slot 0
    — bounds the compiled batch shapes; padded output is discarded."""
    import servers.openai_server as srv

    stub = _StubBatchModel()
    monkeypatch.setattr(srv, "_model", stub)
    monkeypatch.setattr(srv, "_voices", {"alloy": {"ref_audio": None, "xvec_only": True}})
    monkeypatch.setattr(srv, "_scheduler", srv.BatchScheduler(stub, 8, 0.5))
    app = srv.make_app()

    async def drive():
        async with TestClient(TestServer(app)) as client:
            rs = await asyncio.gather(*[
                client.post("/v1/audio/speech",
                            json={"input": f"t{i}", "voice": "alloy",
                                  "response_format": "pcm"})
                for i in range(3)
            ])
            assert all(r.status == 200 for r in rs)
            return [await r.read() for r in rs]

    bodies = run(drive())
    assert len(stub.batch_calls) == 1
    reqs = stub.batch_calls[0]
    assert len(reqs) == 4  # padded to pow2
    assert reqs[3]["text"] == reqs[0]["text"]  # replicated slot 0
    for b in bodies:
        assert np.frombuffer(b, np.int16).size == 2 * 8 * 1920


class _StubContinuousModel(_StubModel):
    """Model whose continuous_batcher is a fake admission pump: run(wait=True)
    serves submitted requests 2 chunks each, raising if a request's text is
    'boom' (the per-admission failure domain)."""

    sample_rate = 24000

    def continuous_batcher(self, max_slots=8, chunk_size=8, **kw):
        model = self

        class _FakeCB:
            def __init__(self):
                self._pending = []
                self._next = 0

            def submit(self, request, **_kw):
                sid = self._next
                self._next += 1
                self._pending.append((sid, request))
                return sid

            def run(self, wait=False):
                import time as _t

                idle = 0.0
                while True:
                    if not self._pending:
                        _t.sleep(0.005)
                        idle += 0.005
                        if idle > 1.0:
                            return  # test pump: give up after 1s idle
                        continue
                    idle = 0.0
                    sid, req = self._pending.pop(0)
                    if req["text"] == "boom":
                        raise RuntimeError("bad voice config")
                    for i in range(2):
                        yield (
                            sid,
                            np.full(chunk_size * 1920, 0.01 * (sid + 1), np.float32),
                            model.sample_rate,
                            {"chunk_index": i, "slot": sid % max_slots,
                             "is_final": i == 1, "total_steps_so_far": (i + 1) * chunk_size,
                             "ttfa_from_submit_ms": 1.0, "admit_wait_ms": 0.0},
                        )

        return _FakeCB()


def test_openai_continuous_serving(monkeypatch):
    """--continuous mode: requests are admitted into the running pump and
    each response gets exactly its own stream's audio; a request that fails
    at admission errors ONLY in-flight streams — the pump restarts and later
    requests serve normally."""
    import servers.openai_server as srv

    stub = _StubContinuousModel()
    monkeypatch.setattr(srv, "_model", stub)
    monkeypatch.setattr(srv, "_voices", {"alloy": {"ref_audio": None, "xvec_only": True}})
    monkeypatch.setattr(srv, "_scheduler", None)
    cont = srv.ContinuousScheduler(stub, max_slots=4, chunk_size=8)
    monkeypatch.setattr(srv, "_continuous", cont)
    app = srv.make_app()

    async def drive():
        async with TestClient(TestServer(app)) as client:
            r1, r2 = await asyncio.gather(
                client.post("/v1/audio/speech",
                            json={"input": "first", "voice": "alloy"}),
                client.post("/v1/audio/speech",
                            json={"input": "second", "voice": "alloy",
                                  "response_format": "pcm"}),
            )
            assert r1.status == 200 and r2.status == 200
            b1, b2 = await r1.read(), await r2.read()
            health = await (await client.get("/health")).json()
            # a poisoned request kills only itself/in-flight lanes ...
            rb = await client.post(
                "/v1/audio/speech",
                json={"input": "boom", "voice": "alloy", "response_format": "pcm"})
            bb = await rb.read()
            # ... and the restarted pump serves the next request
            r3 = await client.post(
                "/v1/audio/speech",
                json={"input": "after", "voice": "alloy", "response_format": "pcm"})
            assert r3.status == 200
            b3 = await r3.read()
            return b1, b2, b3, bb, health

    b1, b2, b3, bb, health = run(drive())
    assert health["continuous"] and health["max_slots"] == 4
    assert b1[:4] == b"RIFF"
    # streams got per-sid audio (sid s emits 0.01*(s+1)), 2 chunks each
    pcm1 = np.frombuffer(b1[44:], np.int16)
    pcm2 = np.frombuffer(b2, np.int16)
    assert pcm1.size == 2 * 8 * 1920 and pcm2.size == 2 * 8 * 1920
    assert abs(int(pcm1[0])) != abs(int(pcm2[0]))  # distinct sids
    assert bb == b""  # poisoned stream: error surfaced as empty stream
    assert np.frombuffer(b3, np.int16).size == 2 * 8 * 1920


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


# --- auth / quota subsystem (reference demo/server.py:212-588) ---------------


def test_usage_db_quota_and_pseudonymization(tmp_path):
    from servers.usage_db import QuotaExceeded, UsageDB

    db = UsageDB(tmp_path / "usage.sqlite3", hash_secret=b"s3cret", daily_free_limit=3)
    for i in range(3):
        payload = db.consume("alice@example", username="alice")
        assert payload["used_today"] == i + 1
        assert payload["remaining"] == 3 - (i + 1)
    with pytest.raises(QuotaExceeded):
        db.consume("alice@example", username="alice")
    # pro users bypass the limit (reference demo/server.py:566-571)
    for _ in range(5):
        payload = db.consume("bob", username="bob", is_pro=True)
    assert payload["limit"] is None and payload["remaining"] is None
    # raw identifiers never at rest: only HMAC pseudonyms in the file
    raw = (tmp_path / "usage.sqlite3").read_bytes()
    assert b"alice@example" not in raw
    assert db.hash_user("alice@example").encode() in raw
    # get_usage does not consume
    before = db.get_usage("bob", is_pro=True)["used_today"]
    assert db.get_usage("bob", is_pro=True)["used_today"] == before


def test_usage_db_legacy_migration(tmp_path):
    import sqlite3

    from servers.usage_db import UsageDB

    path = tmp_path / "usage.sqlite3"
    with sqlite3.connect(path) as con:
        con.execute(
            "CREATE TABLE usage_daily (user_sub TEXT, day TEXT, is_pro INTEGER,"
            " count INTEGER, updated_at INTEGER, username TEXT)"
        )
        con.execute(
            "INSERT INTO usage_daily VALUES ('carol', '2026-08-16', 0, 7, 123, 'carol')"
        )
    db = UsageDB(path, hash_secret=b"k", daily_free_limit=10)
    from datetime import datetime, timezone

    today = datetime.now(timezone.utc).date().isoformat()
    # migrated count visible under the pseudonymized key
    with sqlite3.connect(path) as con:
        db._ensure_db_locked()
        rows = con.execute("SELECT user_key, count FROM usage_daily").fetchall()
    assert rows == [(db.hash_user("carol"), 7)]
    with sqlite3.connect(path) as con:
        cols = {r[1] for r in con.execute("PRAGMA table_info(usage_daily)").fetchall()}
    assert "user_sub" not in cols and "user_key" in cols
    assert today  # (quota math itself covered above)


def test_web_gate_tokens():
    from servers.usage_db import WebGate

    gate = WebGate(secret=b"gate", ttl_seconds=100)
    tok = gate.make_token("1.2.3.4|ua")
    assert gate.verify(tok, "1.2.3.4|ua")
    assert not gate.verify(tok, "5.6.7.8|ua")  # bound to fingerprint
    assert not gate.verify("garbage", "1.2.3.4|ua")
    # expired: hand-build a token with an old timestamp
    ts = str(int(__import__("time").time()) - 1000)
    old = f"{ts}.n.{gate._sign(ts, 'n', '1.2.3.4|ua')}"
    assert not gate.verify(old, "1.2.3.4|ua")
    # different secret -> invalid
    assert not WebGate(secret=b"other", ttl_seconds=100).verify(tok, "1.2.3.4|ua")


def test_demo_require_login_and_quota(monkeypatch, tmp_path):
    import servers.demo_server as demo
    from servers.usage_db import UsageDB

    class _Cache:
        def get(self, key, quant):
            return _StubModel()

        def loaded(self):
            return ["stub"]

    monkeypatch.setattr(demo, "_models", _Cache())
    monkeypatch.setattr(demo, "REQUIRE_LOGIN", True)
    monkeypatch.setattr(
        demo, "_usage_db",
        UsageDB(tmp_path / "u.sqlite3", hash_secret=b"k", daily_free_limit=2),
    )
    app = demo.make_app()

    async def body():
        async with TestClient(TestServer(app)) as client:
            # anonymous -> 401 on generation, login splash on /
            r = await client.post("/generate/stream", json={"text": "hi"})
            assert r.status == 401
            r = await client.get("/")
            assert "Sign in" in (await r.text())

            # identified user via the pluggable parser
            monkeypatch.setattr(
                demo, "_oauth_parser",
                lambda req: {"sub": "u1", "username": "u1", "is_pro": False},
            )
            st = await (await client.get("/status")).json()
            assert st["require_login"] and st["user"]["username"] == "u1"
            assert st["usage"]["remaining"] == 2

            for expect in (1, 0):
                r = await client.post(
                    "/generate/stream", json={"text": "hi", "xvec_only": True}
                )
                assert r.status == 200
                events = [json.loads(l[6:]) for l in (await r.read()).decode().splitlines()
                          if l.startswith("data: ")]
                done = [e for e in events if e["type"] == "done"][0]
                assert done["usage"]["remaining"] == expect
            # out of quota -> 429
            r = await client.post("/generate/stream", json={"text": "hi"})
            assert r.status == 429
            # /usage reflects the consumption without consuming
            u = await (await client.get("/usage")).json()
            assert u["usage"]["used_today"] == 2

    run(body())


def test_demo_invalid_payload_does_not_burn_quota(monkeypatch, tmp_path):
    """400-rejected payloads (bad chunk_size, oversize text) must not consume
    a free-tier unit (ADVICE r2): quota is consumed only after validation."""
    import servers.demo_server as demo
    from servers.usage_db import UsageDB

    class _Cache:
        def get(self, key, quant):
            return _StubModel()

        def loaded(self):
            return ["stub"]

    monkeypatch.setattr(demo, "_models", _Cache())
    monkeypatch.setattr(demo, "REQUIRE_LOGIN", True)
    monkeypatch.setattr(
        demo, "_oauth_parser",
        lambda req: {"sub": "u1", "username": "u1", "is_pro": False},
    )
    monkeypatch.setattr(
        demo, "_usage_db",
        UsageDB(tmp_path / "u.sqlite3", hash_secret=b"k", daily_free_limit=2),
    )
    app = demo.make_app()

    async def body():
        async with TestClient(TestServer(app)) as client:
            for bad_payload in (
                {"text": "hi", "chunk_size": 5},      # not a warmed shape
                {"text": "hi", "chunk_size": "big"},  # not an integer
                {"text": "x" * 2000},                 # over MAX_TEXT_CHARS
                {"text": ""},                         # empty
            ):
                r = await client.post("/generate/stream", json=bad_payload)
                assert r.status == 400, bad_payload
            u = await (await client.get("/usage")).json()
            assert u["usage"]["used_today"] == 0  # nothing burned
            # a valid request still works and consumes exactly one unit
            r = await client.post(
                "/generate/stream", json={"text": "hi", "xvec_only": True}
            )
            assert r.status == 200
            await r.read()
            u = await (await client.get("/usage")).json()
            assert u["usage"]["used_today"] == 1

    run(body())


def test_demo_web_only_token_gate(monkeypatch):
    import servers.demo_server as demo

    class _Cache:
        def get(self, key, quant):
            return _StubModel()

        def loaded(self):
            return ["stub"]

    monkeypatch.setattr(demo, "_models", _Cache())
    monkeypatch.setattr(demo, "WEB_ONLY_MODE", True)
    app = demo.make_app()

    async def body():
        async with TestClient(TestServer(app)) as client:
            # no page token -> 403
            r = await client.post("/generate/stream", json={"text": "hi"})
            assert r.status == 403
            # load the page, extract the bootstrapped token
            html = await (await client.get("/")).text()
            marker = "window.__FQ3T_WEB_TOKEN__ = "
            start = html.index(marker) + len(marker)
            token = json.loads(html[start: html.index(";", start)])
            r = await client.post(
                "/generate/stream",
                json={"text": "hi", "xvec_only": True},
                headers={demo.WEB_TOKEN_HEADER: token},
            )
            assert r.status == 200
            # cross-site fetch metadata -> 403 even with a token
            r = await client.post(
                "/generate/stream", json={"text": "hi"},
                headers={demo.WEB_TOKEN_HEADER: token, "sec-fetch-site": "cross-site"},
            )
            assert r.status == 403

    run(body())
