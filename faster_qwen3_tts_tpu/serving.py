"""Continuous batching: requests join a RUNNING batch at chunk boundaries.

The round-4 batched API (`generate_voice_clone_streaming_batch`) admits all
B prompts in lockstep: one B-wide prefill, then every stream's first chunk
waits for the whole batch. Per-stream TTFA degraded 101 -> 515 ms at
B=1 -> 8 (bench_results_multistream_e2e). This module is the admission-
control answer (VERDICT r4 next #6): a fixed pool of B engine lanes runs a
steady chunk pump, and each arriving request pays only

    its OWN device-assembled prompt + B=1 prefill + ONE SOLO FIRST CHUNK
    (both through the solo executables, warm from warmup()) + at most one
    in-flight chunk of waiting,

then enters via `core.insert_slot` — a donated dynamic-slice write of one
lane of the batch KV cache. Finished lanes (EOS or budget) free their slot
for the next pending request. The compiled decode executable never changes
shape.

The solo first chunk is the TTFA move (round 5): without it, a joining
request's first audio waited for the NEXT pool-wide chunk — a chunk-8 step
walls ~0.5 s at B=8, which dominated TTFA-from-submit (758 ms p50 in the
first r5 capture). Decoding the first `first_chunk_size` frames through the
B=1 `decode_chunk` executable at admission (device idle at a boundary) and
vocoding them through the lane's own host vocoder emits first audio in
B=1 time, independent of pool width; the lane then enters the pool with
`first` frames already emitted and its hist-window rows seeded so the
young->mature vocode accounting stays exact. Cost: the pool stalls one solo
chunk (~tens of ms) per admission — latency bought with a sliver of
aggregate throughput.

The reference has no analog (requests serialize behind a mutex, reference
openai_server.py:71); this is TPU-native serving structure: fixed-shape
executables + lane surgery instead of dynamic batching.

Vocoding is two-phase per lane. A lane's first ceil(ctx/chunk) chunks use
its own incremental host vocoder (model._StreamVocoder): the shared device
history window still contains the slot's PREVIOUS occupant at those ages.
Once the lane has >= ctx real frames, the window is entirely its own
(new_hist = the last ctx frames of [hist | chunk], so occupant garbage ages
out) and the lane switches to the batched device vocode: one
`fused_stream._vocode_window` dispatch chained behind the decode chunk
vocodes EVERY lane's window, one fetch returns audio+tokens+flags for the
whole pool. The host->fused seam is sample-exact for x-vector lanes: the
host path's cumulative emission after f frames is f*up - D, and the fused
window emits window-local [ctx*up - D, (ctx+chunk)*up - D) — absolutely
contiguous at f = ctx. ICL lanes (ref_code present) keep the host vocoder
for their whole stream: their early-phase proportional reference trim makes
the cumulative sample count approximate, so the seam is not exact there
(same reason the lockstep API routes mixed batches to host vocoders).
"""
from __future__ import annotations

import time
from collections import deque
from typing import Any, Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .engine import aot, core, fused_stream
from .engine import generate as gen_lib
from .ops.sampling import SamplingParams


def _set_tth_row(tth, row, slot):
    """Write one lane's trailing-text hiddens [1, tb, H] into [B, tb, H]."""
    z = jnp.zeros((), jnp.int32)
    return jax.lax.dynamic_update_slice(tth, row.astype(tth.dtype), (slot, z, z))


_set_tth_row_jit = jax.jit(_set_tth_row, donate_argnames=("tth",))


def _seed_hist_row(hist, frames, slot):
    """Write a lane's solo-first-chunk frames into the NEWEST rows of its
    shared-history window [B, ctx, 16], so `frames_emitted >= ctx` keeps
    meaning "every window row is the lane's own real frame" (the maturity
    condition for the batched device vocode)."""
    z = jnp.zeros((), jnp.int32)
    start = jnp.asarray(hist.shape[1] - frames.shape[0], jnp.int32)
    return jax.lax.dynamic_update_slice(hist, frames[None], (slot, start, z))


_seed_hist_row_jit = jax.jit(_seed_hist_row, donate_argnames=("hist",))


class _Stream:
    __slots__ = ("sid", "request", "slot", "submitted_at", "admitted_at",
                 "first_audio_at", "vocoder", "frames_emitted",
                 "max_new_tokens", "host_only")

    def __init__(self, sid, request, max_new_tokens):
        self.sid = sid
        self.request = request
        self.slot = None
        self.submitted_at = time.perf_counter()
        self.admitted_at = None
        self.first_audio_at = None
        self.vocoder = None
        self.frames_emitted = 0
        self.max_new_tokens = max_new_tokens
        # ICL lanes stay on the host vocoder (module docstring: the early
        # proportional reference trim makes the host->fused seam inexact).
        self.host_only = False


class ContinuousBatcher:
    """Fixed-pool continuous batching over one model.

    Usage:
        cb = ContinuousBatcher(model, max_slots=8, chunk_size=8)
        sid = cb.submit({"text": ..., "voice_clone_prompt": ..., ...})
        for sid, audio, sr, timing in cb.run():   # until drained
            ...
    `submit` may be called between chunks (or from another thread — the
    pending queue is append-only and the pump reads it at boundaries).
    """

    def __init__(
        self,
        model,
        max_slots: int = 8,
        chunk_size: int = 8,
        first_chunk_size: Optional[int] = None,
        max_new_tokens: int = 2048,
        min_new_tokens: int = 2,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        do_sample: bool = True,
        repetition_penalty: float = 1.05,
        seed: Optional[int] = None,
        subtalker_dosample: Optional[bool] = None,
        subtalker_top_k: Optional[int] = None,
        subtalker_top_p: Optional[float] = None,
        subtalker_temperature: Optional[float] = None,
    ):
        if model.mesh is not None:
            raise ValueError("continuous batching is single-chip for now; "
                             "use the lockstep batched API under a dp mesh")
        self.model = model
        self.B = max_slots
        self.chunk_size = chunk_size
        # The solo admission chunk: smaller = earlier first audio, at the
        # cost of one extra warm decode_chunk executable shape. Defaults to
        # chunk_size (always warm wherever the pool's own chunk is).
        self.first_chunk = first_chunk_size or chunk_size
        self.max_new_tokens = max_new_tokens
        self.min_new_tokens = min_new_tokens
        self.sampling = SamplingParams(temperature, top_k, top_p, do_sample,
                                       repetition_penalty)
        self.pred_sampling = gen_lib.predictor_sampling(
            subtalker_dosample, subtalker_top_k, subtalker_top_p,
            subtalker_temperature,
        )
        self._pending: deque = deque()
        self._slots: List[Optional[_Stream]] = [None] * max_slots
        self._next_sid = 0
        self._seed = seed
        self._state = None  # built lazily on first admission
        self._tth = None
        self._tpe = None
        self._hist = None  # [B, ctx, 16] shared codec-history window
        self._ctx = gen_lib.CONTEXT_FRAMES
        self._cancelled: set = set()
        self._closed = False

    def close(self) -> None:
        """No further submits: run(wait=True) drains and returns."""
        self._closed = True

    def cancel(self, sid: int) -> None:
        """Release a stream's lane at the next chunk boundary (e.g. the
        client disconnected): without this a dead request would keep
        decoding up to its max_new_tokens while occupying a pool slot.
        Safe from any thread; unknown/finished sids are ignored. The pump
        yields one final `cancelled` terminal for the stream."""
        self._cancelled.add(sid)

    # ------------------------------------------------------------- admission

    def submit(self, request: Dict[str, Any],
               max_new_tokens: Optional[int] = None) -> int:
        s = _Stream(self._next_sid, request,
                    max_new_tokens or self.max_new_tokens)
        self._next_sid += 1
        self._pending.append(s)
        return s.sid

    def _bootstrap(self, tth_row, tpe):
        """Build the B-lane batch state from one dummy prompt; all lanes
        start done=True (masked) until a real stream is inserted."""
        m = self.model
        H = m.config.talker.hidden_size
        bucket = gen_lib.PREFILL_BUCKETS[0]
        dtype = m.params["talker"]["codec_embed"].dtype
        tie = jnp.zeros((self.B, bucket, H), dtype)
        mask = jnp.ones((self.B, bucket), jnp.int32)
        seed = self._seed
        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**31 - 1))
        state, _ = aot.call(
            "start_state", core.start_state,
            talker_params=m.params["talker"], talker_cfg=m.config.talker,
            embeds=tie, pad_mask=mask, key=jax.random.PRNGKey(seed),
            max_seq=m.max_seq_len, sampling=self.sampling,
            min_new_tokens=self.min_new_tokens,
        )
        self._state = state._replace(done=jnp.ones((self.B,), jnp.bool_))
        tb = gen_lib.tth_bucket(tth_row.shape[1])
        self._tth = jnp.zeros((self.B, tb, H), dtype)
        self._tpe = jnp.asarray(tpe, dtype)
        self._hist = jnp.zeros(
            (self.B, self._ctx, m.config.talker.num_code_groups), jnp.int32
        )

    def _admit(self, s: _Stream, slot: int) -> Tuple[np.ndarray, int, bool, float]:
        """Admit one stream: B=1 prefill + SOLO first chunk (first audio
        emitted here, in B=1 time), then lane surgery into the running batch.
        Returns (first_audio, frames_emitted, finished, solo_ms); when
        `finished` (EOS or budget inside the first chunk) the stream never
        occupies the slot."""
        m = self.model
        r = s.request
        nsm = m._resolve_non_streaming_mode(r.get("non_streaming_mode"), default=False)
        tie, tam, tth, tpe, ref_codes = m._prepare_generation(
            text=r["text"], language=r.get("language", "English"),
            ref_audio=r.get("ref_audio"), ref_text=r.get("ref_text", ""),
            xvec_only=bool(r.get("xvec_only", False)), non_streaming_mode=nsm,
            append_silence=bool(r.get("append_silence", True)),
            voice_clone_prompt=r.get("voice_clone_prompt"),
            instruct=r.get("instruct"),
        )
        if self._state is None:
            self._bootstrap(np.asarray(tth, np.float32), tpe)
        if tth.shape[1] > self._tth.shape[1]:
            # The pool's trailing-text bucket is one compiled shape; a
            # longer-than-bucket text must fail THIS request (before any
            # lane surgery touches shared state), never the pump.
            raise ValueError(
                f"request trailing text ({tth.shape[1]} rows) exceeds the "
                f"pool's compiled bucket ({self._tth.shape[1]}); shorten the "
                "text or serve it through the solo/lockstep path"
            )
        # B=1 prefill through the SAME bucketed executable solo serving uses
        # (warm from warmup()).
        sess = gen_lib.GenerationSession(
            m.params, m.config, tie, tam, tth, tpe, m.max_seq_len,
            self.sampling, self.pred_sampling, self.min_new_tokens,
            seed=self._seed, dtype=m.dtype,
        )
        s.admitted_at = time.perf_counter()
        sess.prefill(block=False)
        # Solo first chunk: first audio NOW instead of after the next
        # pool-wide chunk wall. One fetch drains prefill + chunk together;
        # the lane's own vocoder (the young-phase host path) keeps sample
        # continuity with every later chunk for xvec AND ICL lanes alike.
        t0 = time.perf_counter()
        frames, done = sess.decode_chunk(self.first_chunk)
        v = min(frames.shape[0], s.max_new_tokens)
        s.vocoder = m._make_stream_vocoder(ref_codes)
        s.host_only = ref_codes is not None
        audio = (s.vocoder.vocode_new(frames[:v]) if v > 0
                 else np.zeros((0,), np.float32))
        s.frames_emitted = v
        now = time.perf_counter()
        if v > 0:
            s.first_audio_at = now
        finished = bool(done) or v >= s.max_new_tokens
        if finished:
            return audio, v, True, (now - t0) * 1000.0
        # Not finished => no EOS and no budget stop => every frame of the
        # solo chunk was valid: v == first_chunk. Lane surgery: KV/state into
        # the pool, trailing text row, and the hist window's newest rows
        # seeded with the solo frames (maturity accounting stays exact).
        self._state = core.insert_slot(
            self._state, sess.state, jnp.asarray(slot, jnp.int32)
        )
        tb = self._tth.shape[1]
        row = gen_lib._pad_trailing(
            np.asarray(tth, np.float32), np.asarray(tpe, np.float32), tb
        ) if tth.shape[1] != tb else tth
        self._tth = _set_tth_row_jit(self._tth, jnp.asarray(row),
                                     jnp.asarray(slot, jnp.int32))
        k = min(v, self._ctx)
        self._hist = _seed_hist_row_jit(
            self._hist, jnp.asarray(frames[v - k:v], jnp.int32),
            jnp.asarray(slot, jnp.int32),
        )
        s.slot = slot
        self._slots[slot] = s
        return audio, v, False, (now - t0) * 1000.0

    def _admit_pending(self):
        """Admit pending requests into free slots. Returns (emissions,
        failures): emissions are the solo-first-chunk yields (one per
        admitted or admission-finished stream); a request whose admission
        fails (oversized text/prompt, bad voice_clone_prompt, ...) becomes a
        (stream, error) pair for the pump to terminate — admission errors
        are per-request, never fatal to the pool."""
        emits: List[Tuple[_Stream, int, np.ndarray, int, bool, float]] = []
        failed: List[Tuple[_Stream, Exception]] = []
        for slot in range(self.B):
            while self._pending and self._slots[slot] is None:
                s = self._pending.popleft()
                try:
                    audio, v, finished, solo_ms = self._admit(s, slot)
                    emits.append((s, slot, audio, v, finished, solo_ms))
                except Exception as e:  # noqa: BLE001 — isolate bad requests
                    failed.append((s, e))
        return emits, failed

    # ------------------------------------------------------------------ pump

    def run(self, wait: bool = False) -> Generator[Tuple[int, np.ndarray, int, Dict[str, Any]], None, None]:
        """Pump chunks until every submitted stream finished. Yields
        (stream_id, audio_chunk float32, sample_rate, timing).

        wait=True: keep serving across idle gaps until close() is called —
        the server mode, where submit() happens from another thread."""
        m = self.model
        chunk_index = 0
        while self._pending or any(self._slots) or (wait and not self._closed):
            if not self._pending and not any(self._slots):
                time.sleep(0.001)  # idle: wait for a submit or close()
                continue
            emits, failed = self._admit_pending()
            for s, err in failed:
                # Per-request admission failure: terminate THAT request with
                # an error terminal; the pool keeps serving everyone else.
                yield s.sid, np.zeros((0,), np.float32), m.sample_rate, {
                    "chunk_index": chunk_index, "slot": -1, "chunk_steps": 0,
                    "decode_ms": 0.0, "total_steps_so_far": 0,
                    "is_final": True, "error": str(err),
                    "ttfa_from_submit_ms": round(
                        (time.perf_counter() - s.submitted_at) * 1000.0, 1),
                    "admit_wait_ms": round(
                        (time.perf_counter() - s.submitted_at) * 1000.0, 1),
                }
            for s, slot, audio, v, finished, solo_ms in emits:
                # Solo first chunk: the stream's first audio, emitted at
                # admission in B=1 time (is_final when EOS/budget landed
                # inside it — the stream then never occupied the slot).
                yield s.sid, audio, m.sample_rate, {
                    "chunk_index": chunk_index, "slot": slot,
                    "chunk_steps": v, "decode_ms": round(solo_ms, 1),
                    "total_steps_so_far": s.frames_emitted,
                    "is_final": finished, "solo_first_chunk": True,
                    "ttfa_from_submit_ms": round(
                        ((s.first_audio_at or time.perf_counter())
                         - s.submitted_at) * 1000.0, 1),
                    "admit_wait_ms": round(
                        (s.admitted_at - s.submitted_at) * 1000.0, 1),
                }
                if finished:
                    self._cancelled.discard(s.sid)
            if self._cancelled:
                # Free cancelled lanes BEFORE the next dispatch: release the
                # KV lane, drop still-pending cancelled submissions, and
                # yield each stream's terminal.
                for _ in range(len(self._pending)):
                    p = self._pending.popleft()
                    if p.sid in self._cancelled:
                        self._cancelled.discard(p.sid)
                    else:
                        self._pending.append(p)
                for slot, s in enumerate(self._slots):
                    if s is None or s.sid not in self._cancelled:
                        continue
                    self._state = core.release_slot(
                        self._state, jnp.asarray(slot, jnp.int32)
                    )
                    self._slots[slot] = None
                    self._cancelled.discard(s.sid)
                    yield s.sid, np.zeros((0,), np.float32), m.sample_rate, {
                        "chunk_index": chunk_index, "slot": slot,
                        "chunk_steps": 0, "decode_ms": 0.0,
                        "total_steps_so_far": s.frames_emitted,
                        "is_final": True, "cancelled": True,
                        "ttfa_from_submit_ms": round(
                            ((s.first_audio_at or time.perf_counter())
                             - s.submitted_at) * 1000.0, 1),
                        "admit_wait_ms": round(
                            (s.admitted_at - s.submitted_at) * 1000.0, 1),
                    }
            if not any(self._slots):
                continue  # every pending request failed admission/cancelled
            t0 = time.perf_counter()
            self._state, packed = aot.call(
                "decode_chunk", core.decode_chunk,
                talker_params=m.params["talker"], pred_params=m.params["predictor"],
                talker_cfg=m.config.talker, pred_cfg=m.config.predictor,
                state=self._state, trailing_text=self._tth, tts_pad_embed=self._tpe,
                chunk_size=self.chunk_size, sampling=self.sampling,
                pred_sampling=self.pred_sampling, min_new_tokens=self.min_new_tokens,
            )
            # Batched window vocode chained device-side behind the chunk: one
            # dispatch, ONE fetch for every lane's audio+tokens+flags (the
            # lockstep fused path's shape, reused executable-for-executable).
            self._hist, flat = aot.call(
                "vocode_window", fused_stream._vocode_window,
                codec_params=m.params["codec"], talker_cfg=m.config.talker,
                codec_cfg=m.config.codec, hist=self._hist, packed=packed,
                chunk_size=self.chunk_size, ctx=self._ctx,
            )
            up = m.config.codec.total_upsample
            audio_b, frames, valid, done = fused_stream.split_fused_output_batch(
                flat, self.chunk_size, self.B, m.config.talker.num_code_groups, up
            )
            decode_ms = (time.perf_counter() - t0) * 1000.0
            for slot, s in enumerate(self._slots):
                if s is None:
                    continue
                v = int(valid[:, slot].sum())
                v = min(v, s.max_new_tokens - s.frames_emitted)
                finished = bool(done[slot])
                if v > 0:
                    if not s.host_only and s.frames_emitted >= self._ctx:
                        # Mature lane: its window rows are all its own real
                        # frames — take the device-vocoded samples directly.
                        audio = audio_b[slot, : v * up]
                    else:
                        audio = s.vocoder.vocode_new(
                            frames[:, slot][valid[:, slot]][:v]
                        )
                    s.frames_emitted += v
                    if s.first_audio_at is None:
                        s.first_audio_at = time.perf_counter()
                    if s.frames_emitted >= s.max_new_tokens and not finished:
                        finished = True
                        self._state = core.release_slot(
                            self._state, jnp.asarray(slot, jnp.int32)
                        )
                elif finished:
                    # EOS landed exactly on the previous chunk boundary:
                    # this chunk carries zero valid frames for the lane, but
                    # the consumer still needs its is_final terminal (a
                    # server maps it to the end-of-stream sentinel; without
                    # it the request would hang forever).
                    audio = np.zeros((0,), np.float32)
                else:
                    continue
                if s.first_audio_at is None:
                    s.first_audio_at = time.perf_counter()
                yield s.sid, audio, m.sample_rate, {
                    "chunk_index": chunk_index,
                    "slot": slot,
                    "chunk_steps": v,
                    "decode_ms": decode_ms,
                    "total_steps_so_far": s.frames_emitted,
                    "is_final": finished,
                    "ttfa_from_submit_ms": round(
                        (s.first_audio_at - s.submitted_at) * 1000.0, 1),
                    "admit_wait_ms": round(
                        (s.admitted_at - s.submitted_at) * 1000.0, 1),
                }
                if finished:
                    self._slots[slot] = None  # slot freed for the next admit
                    self._cancelled.discard(s.sid)  # no stale-entry buildup
            chunk_index += 1
