"""OpenAI-compatible TTS server: POST /v1/audio/speech (+ /health).

Same HTTP contract as the reference's FastAPI server (reference
examples/openai_server.py:214-265): OpenAI TTS request body, wav/pcm
streaming responses (wav header with unknown length), a voices.json registry
mapping voice names to reference audio, and a device mutex serializing
generation. Built on aiohttp (the async stack available in this image);
the blocking generator runs in a producer thread bridged by a queue
(reference openai_server.py:171-206).

`--batch N` replaces the mutex with dp-batched serving — the TPU-native
extension the reference lacks (its requests serialize behind a lock,
reference openai_server.py:71). Concurrent streaming requests are
micro-batched: a scheduler thread collects up to N requests for
`--batch-window-ms`, then decodes them in lockstep as ONE engine batch
(`generate_voice_clone_streaming_batch`, dp-sharded when the model was
loaded with dp>1), routing each slot's chunks to its response. Batch sizes
are padded up to pow2 buckets so at most log2(N)+1 executables ever
compile (on-chip scaling: B=8 aggregates 3.25x the B=1 throughput,
benchmarks/multistream.py).

Run:  python servers/openai_server.py --model <id> [--voices voices.json]
"""
from __future__ import annotations

import argparse
import asyncio
import json
import logging
import os
import queue
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from aiohttp import web

from faster_qwen3_tts_tpu.utils.audio import float_to_pcm16, wav_header
from servers.qcommon import terminal_put

logger = logging.getLogger("openai_server")

_model = None
_model_lock = asyncio.Lock()
# The serving chunk sizes warmup precompiles (8 = default + 4-frame first
# chunk; 12 = the reference API default). Requests outside this set would
# trigger unbounded new executables.
ALLOWED_CHUNK_SIZES = frozenset({4, 8, 12})
# Serializes device access between the batch scheduler thread and the
# executor-thread mp3 path (asyncio locks don't span plain threads).
_engine_tlock = threading.Lock()
_scheduler = None  # BatchScheduler when --batch > 1
_continuous = None  # ContinuousScheduler when --continuous > 1
_voices = {}


class _BatchJob:
    """One streaming request waiting for (or inside) an engine batch."""

    def __init__(self, request: dict, chunk_size: int):
        self.request = request
        self.chunk_size = chunk_size
        self.out_q: queue.Queue = queue.Queue(maxsize=32)
        # Set when the HTTP consumer goes away (disconnect/write error). The
        # producer must NEVER block forever on a bounded queue nobody drains
        # — in batch mode that would wedge the scheduler thread for every
        # future request.
        self.cancelled = False


class BatchScheduler:
    """Micro-batching scheduler: collects concurrent streaming requests into
    one lockstep engine batch (the dp-batched serving mode; the engine-side
    equivalence is pinned by tests/test_batched.py — each stream's tokens
    match its B=1 run).

    A single daemon thread owns generation. Each round it takes the oldest
    job, waits up to `window_s` for more jobs with the SAME chunk_size
    (chunk size is a compile-time constant of the shared executable), pads
    the batch up to a pow2 bucket by replicating slot 0 (bounds the set of
    compiled batch shapes; padded slots' output is discarded), and fans the
    yielded (slot, audio) chunks out to per-job queues. A slot's queue gets
    None at its stream's end, so short streams finish their HTTP response
    while long ones keep decoding.

    Failure domain: prompt preparation happens inside the shared engine call,
    so a request whose voice config is broken (e.g. an operator-registered
    ref_audio path that does not exist) fails the whole round — every job in
    the batch gets the error. Request-side inputs (text, format, voice name)
    are validated per-request in create_speech before submission.
    """

    def __init__(self, model, max_batch: int, window_s: float):
        self.model = model
        self.max_batch = max_batch
        self.window_s = window_s
        self._pending: list = []
        self._cv = threading.Condition()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, job: _BatchJob) -> None:
        with self._cv:
            self._pending.append(job)
            self._cv.notify()

    def _collect(self) -> list:
        with self._cv:
            while not self._pending:
                self._cv.wait()
            first = self._pending.pop(0)
            batch = [first]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                i = 0
                while i < len(self._pending) and len(batch) < self.max_batch:
                    if self._pending[i].chunk_size == first.chunk_size:
                        batch.append(self._pending.pop(i))
                    else:
                        i += 1
                remaining = deadline - time.monotonic()
                if len(batch) >= self.max_batch or remaining <= 0:
                    break
                self._cv.wait(timeout=remaining)
        return batch

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            try:
                self._run(batch)
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("batch generation failed")
                for job in batch:
                    terminal_put(job.out_q, e)

    def _run(self, batch: list) -> None:
        B = len(batch)
        padded = self._bucket(B)
        requests = [j.request for j in batch] + [batch[0].request] * (padded - B)
        finished = [False] * B
        with _engine_tlock:
            for slot, audio, sr, timing in self.model.generate_voice_clone_streaming_batch(
                requests, chunk_size=batch[0].chunk_size
            ):
                if slot >= B or finished[slot]:
                    continue  # padding slot, or trailing chunk after final
                job = batch[slot]
                # A cancelled slot keeps decoding (the batch is lockstep) but
                # its chunks are dropped; put() with a timeout so a consumer
                # that silently stopped draining can only cost one timeout,
                # never a wedged scheduler.
                if not job.cancelled:
                    try:
                        job.out_q.put(float_to_pcm16(audio), timeout=30)
                    except queue.Full:
                        job.cancelled = True
                if timing.get("is_final"):
                    finished[slot] = True
                    terminal_put(job.out_q, None)
        for job in batch:
            # Unconditional, non-blocking: even a cancelled slot's consumer
            # may have an executor thread parked in out_q.get().
            terminal_put(job.out_q, None)


class ContinuousScheduler:
    """Admission-control serving (serving.ContinuousBatcher): a request joins
    the RUNNING batch at the next chunk boundary instead of waiting for a
    micro-batch window or for all B lockstep prefills. One daemon thread owns
    the chunk pump (`run(wait=True)`); per-request chunks fan out to per-job
    queues by stream id.

    Failure domain is smaller than BatchScheduler's: a request whose voice
    config is broken fails at its own admission; the pump is restarted with a
    fresh batcher and every in-flight job gets the error (their lane state
    lives in the dead batcher), but FUTURE requests are unaffected.

    chunk_size is fixed per batcher (it is a compile-shape constant of the
    shared decode executable), so per-request chunk_size is ignored here."""

    def __init__(self, model, max_slots: int, chunk_size: int = 8):
        self.model = model
        self.max_slots = max_slots
        self.chunk_size = chunk_size
        self._jobs: dict = {}
        self._lock = threading.Lock()
        self._make_batcher()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _make_batcher(self) -> None:
        self.cb = self.model.continuous_batcher(
            max_slots=self.max_slots, chunk_size=self.chunk_size
        )

    def submit(self, job: _BatchJob) -> None:
        with self._lock:
            sid = self.cb.submit(job.request)
            self._jobs[sid] = job

    def _loop(self) -> None:
        # No _engine_tlock here: the pump never returns, and in continuous
        # mode EVERY request (including mp3) is routed through the batcher,
        # so there is no competing engine user to serialize against.
        while True:
            try:
                for sid, audio, _sr, timing in self.cb.run(wait=True):
                    with self._lock:
                        job = self._jobs.get(sid)
                    if job is None:
                        continue
                    if not job.cancelled:
                        try:
                            job.out_q.put(float_to_pcm16(audio), timeout=30)
                        except queue.Full:
                            job.cancelled = True
                    if job.cancelled and not timing.get("is_final"):
                        # Dead consumer: release the lane instead of decoding
                        # its remaining max_new_tokens budget into the void.
                        self.cb.cancel(sid)
                    if timing.get("is_final"):
                        # Per-request admission failures arrive as an error
                        # terminal (serving._admit_pending): the client gets
                        # a real error, not an empty 200.
                        err = timing.get("error")
                        terminal_put(job.out_q, RuntimeError(err) if err else None)
                        with self._lock:
                            self._jobs.pop(sid, None)
                return  # run() only exits after close(); server never closes
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("continuous pump failed; restarting batcher")
                with self._lock:
                    dead, self._jobs = self._jobs, {}
                    self._make_batcher()
                for job in dead.values():
                    terminal_put(job.out_q, e)


def _voice_request(text: str, voice: dict) -> dict:
    """The engine-batch request dict for a resolved voice (shared by the
    lockstep and continuous schedulers)."""
    return {
        "text": text,
        "language": voice.get("language", "English"),
        "ref_audio": voice.get("ref_audio"),
        "ref_text": voice.get("ref_text", ""),
        "xvec_only": bool(voice.get("xvec_only", False)),
        "voice_clone_prompt": voice.get("voice_clone_prompt"),
    }


def load_voices(path):
    """voices.json: {"alloy": {"ref_audio": "...", "ref_text": "...",
    "xvec_only": false, "language": "English"}, ...}
    (the registry pattern of reference openai_server.py:146-163)."""
    global _voices
    if path and Path(path).exists():
        with open(path) as f:
            _voices = json.load(f)


def resolve_voice(name: str) -> dict:
    if name in _voices:
        return _voices[name]
    if _voices:
        return next(iter(_voices.values()))
    raise web.HTTPBadRequest(
        text=json.dumps({"error": f"unknown voice {name!r} and no voices registered"}),
        content_type="application/json",
    )


def _stream_chunks(text: str, voice: dict, chunk_size: int, out_q: queue.Queue,
                   cancelled: threading.Event):
    """Producer thread: run the blocking streaming generator, push PCM16.

    `cancelled` is set when the HTTP consumer goes away; the producer then
    stops instead of blocking forever on the bounded queue (which would leak
    the thread and keep the engine generating under a released lock)."""
    terminal = None
    try:
        gen = _model.generate_voice_clone_streaming(
            text,
            voice.get("language", "English"),
            ref_audio=voice.get("ref_audio"),
            ref_text=voice.get("ref_text", ""),
            xvec_only=bool(voice.get("xvec_only", False)),
            chunk_size=chunk_size,
            # 4-frame fused first chunk: first audio ~50 ms earlier per
            # skipped frame (same steady-state chunk cadence afterwards)
            first_chunk_size=min(4, chunk_size),
            voice_clone_prompt=voice.get("voice_clone_prompt"),
        )
        for audio, sr, timing in gen:
            if cancelled.is_set():
                return
            try:
                out_q.put(float_to_pcm16(audio), timeout=30)
            except queue.Full:
                return
    except Exception as e:  # surface errors to the consumer
        logger.exception("generation failed")
        terminal = e
    finally:
        # Always lands, never blocks (evicts a stale chunk if full): the
        # consumer's blocking get() must wake even after a cancel/overflow.
        terminal_put(out_q, terminal)


async def create_speech(request: web.Request) -> web.StreamResponse:
    body = await request.json()
    text = body.get("input")
    if not text:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": "missing 'input'"}), content_type="application/json"
        )
    fmt = body.get("response_format", "wav")
    if fmt not in ("wav", "pcm", "mp3"):
        raise web.HTTPBadRequest(
            text=json.dumps({"error": f"unsupported response_format {fmt!r} (wav|pcm|mp3)"}),
            content_type="application/json",
        )
    voice = resolve_voice(body.get("voice", "default"))
    # chunk_size is a compile-shape key: every distinct value costs a fresh
    # multi-minute remote XLA compile (and fragments --batch coalescing), so
    # clients may only pick from the warmed set.
    try:
        chunk_size = int(body.get("chunk_size", 8))
    except (TypeError, ValueError):
        raise web.HTTPBadRequest(
            text=json.dumps({"error": "chunk_size must be an integer"}),
            content_type="application/json",
        )
    if chunk_size not in ALLOWED_CHUNK_SIZES:
        raise web.HTTPBadRequest(
            text=json.dumps(
                {"error": f"chunk_size must be one of {sorted(ALLOWED_CHUNK_SIZES)}"}
            ),
            content_type="application/json",
        )

    if fmt == "mp3" and _continuous is not None:
        # Continuous mode: mp3 ALSO rides the batcher (one engine owner) —
        # collect the stream's PCM16 chunks, then encode once.
        from faster_qwen3_tts_tpu.utils.mp3 import Mp3Unavailable, encode_mp3

        job = _BatchJob(_voice_request(text, voice), _continuous.chunk_size)
        _continuous.submit(job)
        loop = asyncio.get_event_loop()
        parts = []
        try:
            while True:
                item = await loop.run_in_executor(None, job.out_q.get)
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise web.HTTPInternalServerError(
                        text=json.dumps({"error": str(item)}),
                        content_type="application/json",
                    )
                parts.append(item)
        finally:
            job.cancelled = True
        pcm = np.frombuffer(b"".join(parts), dtype=np.int16)
        try:
            data = encode_mp3(pcm.astype(np.float32) / 32768.0, _model.sample_rate)
        except Mp3Unavailable as e:
            raise web.HTTPNotImplemented(
                text=json.dumps({"error": str(e)}), content_type="application/json"
            )
        return web.Response(body=data, content_type="audio/mpeg")

    if fmt == "mp3":
        # Non-streaming: full generation then one encode (the reference does
        # the same, openai_server.py:242-256 — mp3 frames don't chunk cleanly).
        from faster_qwen3_tts_tpu.utils.mp3 import Mp3Unavailable, encode_mp3

        def run_full():
            # _engine_tlock: in --batch mode generation otherwise lives in the
            # scheduler thread; this keeps the mp3 path from interleaving.
            with _engine_tlock:
                audio, sr = _model.generate_voice_clone(
                    text,
                    voice.get("language", "English"),
                    ref_audio=voice.get("ref_audio"),
                    ref_text=voice.get("ref_text", ""),
                    xvec_only=bool(voice.get("xvec_only", False)),
                    voice_clone_prompt=voice.get("voice_clone_prompt"),
                )
            return encode_mp3(np.asarray(audio[0]), sr)

        async with _model_lock:
            loop = asyncio.get_event_loop()
            try:
                data = await loop.run_in_executor(None, run_full)
            except Mp3Unavailable as e:
                raise web.HTTPNotImplemented(
                    text=json.dumps({"error": str(e)}), content_type="application/json"
                )
        return web.Response(body=data, content_type="audio/mpeg")

    resp = web.StreamResponse(
        status=200,
        headers={"Content-Type": "audio/wav" if fmt == "wav" else "audio/pcm"},
    )
    await resp.prepare(request)

    if _scheduler is not None or _continuous is not None:
        # Batched serving, no mutex: --batch coalesces concurrent requests
        # into one lockstep engine batch; --continuous admits each request
        # into the RUNNING batch at the next chunk boundary.
        if fmt == "wav":
            await resp.write(wav_header(_model.sample_rate))
        job = _BatchJob(_voice_request(text, voice), chunk_size)
        (_scheduler or _continuous).submit(job)
        loop = asyncio.get_event_loop()
        try:
            while True:
                item = await loop.run_in_executor(None, job.out_q.get)
                if item is None or isinstance(item, Exception):
                    break
                await resp.write(item)
        finally:
            job.cancelled = True  # consumer gone: scheduler must not block
        await resp.write_eof()
        return resp

    async with _model_lock:  # one request owns the chip at a time
        if fmt == "wav":
            # unknown-length header (reference openai_server.py:96-113)
            await resp.write(wav_header(_model.sample_rate))
        out_q: queue.Queue = queue.Queue(maxsize=8)
        cancelled = threading.Event()
        t = threading.Thread(
            target=_stream_chunks, args=(text, voice, chunk_size, out_q, cancelled),
            daemon=True,
        )
        t.start()
        loop = asyncio.get_event_loop()
        try:
            while True:
                item = await loop.run_in_executor(None, out_q.get)
                if item is None:
                    break
                if isinstance(item, Exception):
                    break
                await resp.write(item)
        finally:
            cancelled.set()
            # Don't release the engine mutex while the producer is still
            # generating: wait for it to notice the cancel and exit.
            await loop.run_in_executor(None, t.join)
    await resp.write_eof()
    return resp


async def health(request: web.Request) -> web.Response:
    return web.json_response(
        {
            "status": "ok",
            "model_loaded": _model is not None,
            "sample_rate": getattr(_model, "sample_rate", None),
            "voices": sorted(_voices.keys()),
            "batched": _scheduler is not None,
            "max_batch": getattr(_scheduler, "max_batch", 1),
            "continuous": _continuous is not None,
            "max_slots": getattr(_continuous, "max_slots", None),
        }
    )


def make_app() -> web.Application:
    app = web.Application()
    app.router.add_post("/v1/audio/speech", create_speech)
    app.router.add_get("/health", health)
    return app


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Qwen/Qwen3-TTS-12Hz-0.6B-Base")
    ap.add_argument("--quant", default="BF16")
    ap.add_argument("--backend", default="jax")
    ap.add_argument("--voices", default=None, help="voices.json registry")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8880)
    ap.add_argument("--warmup", action="store_true", help="compile before serving")
    ap.add_argument("--aot-cache", default=None, metavar="DIR",
                    help="persist compiled TPU executables to DIR — serving "
                         "restarts reload them instead of recompiling "
                         "(sets FQ3T_AOT_CACHE; pair with --warmup)")
    ap.add_argument("--batch", type=int, default=1, metavar="N",
                    help="dp-batched serving: micro-batch up to N concurrent "
                         "streaming requests into one engine batch "
                         "(1 = mutex-serialized, the reference's model)")
    ap.add_argument("--batch-window-ms", type=float, default=100.0,
                    help="how long the scheduler waits to fill a batch")
    ap.add_argument("--continuous", type=int, default=0, metavar="N",
                    help="continuous batching over N engine lanes: each "
                         "request joins the RUNNING batch at the next chunk "
                         "boundary (no micro-batch window, no lockstep "
                         "prefills; per-request chunk_size is ignored — the "
                         "pool decodes at chunk 8). Mutually exclusive with "
                         "--batch")
    ap.add_argument("--dp", type=int, default=None,
                    help="shard the serving batch over a dp-way device mesh "
                         "(pass to from_pretrained; pair with --batch)")
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel ways for per-request latency")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    if args.aot_cache:
        os.environ["FQ3T_AOT_CACHE"] = args.aot_cache
    global _model, _scheduler, _continuous
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS

    if args.batch > 1 and args.continuous > 1:
        ap.error("--batch and --continuous are mutually exclusive")
    _model = FasterQwen3TTS.from_pretrained(
        args.model, backend=args.backend, quant=args.quant, dp=args.dp, tp=args.tp
    )
    if args.batch > 1:
        _scheduler = BatchScheduler(_model, args.batch, args.batch_window_ms / 1000.0)
    load_voices(args.voices)
    if args.warmup:
        # Warm the exact serving config (default chunk 8, 4-frame fused first
        # chunk, line 71/96): a bare warmup() would leave fused(4, ctx=0) and
        # the ctx ladder {12,20,...} to cold-compile inside the first request
        # (ADVICE r2 medium).
        _model.warmup(chunk_sizes=(8,), first_chunk_size=4)
        if args.continuous > 1:
            # The continuous pool's B-lane executables (start_state/
            # insert_slot/decode_chunk at B=N) are distinct compile shapes
            # from the solo warmup's B=1 set: warm them with one dummy
            # stream through a throwaway batcher before serving.
            cbw = _model.continuous_batcher(
                max_slots=args.continuous, chunk_size=8, max_new_tokens=8
            )
            cbw.submit({
                "text": "warm the continuous lanes.",
                "xvec_only": True,
                "voice_clone_prompt": {
                    "ref_spk_embedding": [np.zeros(2048, np.float32)],
                    "x_vector_only_mode": [True], "icl_mode": [False],
                    "ref_code": [None],
                },
            })
            for _ in cbw.run():
                pass
    if args.continuous > 1:
        _continuous = ContinuousScheduler(_model, args.continuous, chunk_size=8)
    web.run_app(make_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
