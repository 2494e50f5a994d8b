"""Host-side generation drivers over the fused device engine.

Equivalent surface to the reference's generation loops (generate.py
`fast_generate` and streaming.py `fast_generate_streaming` /
`parity_generate_streaming`), with the TPU-native difference that the host
never syncs per frame: the device runs `chunk`-frame fused scans and the host
reads back [chunk, 16] token blocks (+ the EOS flag) once per chunk.

Timing dict contracts match the reference exactly:
  non-streaming: {prefill_ms, decode_s, steps, ms_per_step, steps_per_s}
                 (reference generate.py:204-211)
  streaming:     {chunk_index, chunk_steps, prefill_ms, decode_ms,
                  total_steps_so_far, is_final}   (reference streaming.py:162-188)
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen3TTSConfig
from ..ops.sampling import SamplingParams
from . import aot, core

PREFILL_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)

# Steady-state vocoder left-context window (frames). The single source of
# truth for the engine, model._stream_decode, warmup, and the profilers —
# matching the reference's 25-frame sliding window semantics
# (reference model.py:1048-1056) at the engine's 24-frame geometry.
CONTEXT_FRAMES = 24


def predictor_sampling(
    subtalker_dosample: Optional[bool] = None,
    subtalker_top_k: Optional[int] = None,
    subtalker_top_p: Optional[float] = None,
    subtalker_temperature: Optional[float] = None,
) -> SamplingParams:
    """Predictor (subtalker) sampling params.

    The reference freezes these INDEPENDENTLY of the user's talker sampling —
    PredictorGraph is captured with do_sample=True, top_k=50, temperature=0.9
    (reference model.py:209-218, predictor_graph.py:34-50); user sampling
    kwargs never reach it. Same defaults here, but overridable per call since
    nothing is baked at compile time (jit treats them as static args).
    """
    return SamplingParams(
        0.9 if subtalker_temperature is None else subtalker_temperature,
        50 if subtalker_top_k is None else subtalker_top_k,
        1.0 if subtalker_top_p is None else subtalker_top_p,
        True if subtalker_dosample is None else subtalker_dosample,
        1.0,
    )


def prefill_bucket(n: int, max_seq: int) -> int:
    for b in PREFILL_BUCKETS:
        if b >= n and b <= max_seq:
            return b
    if n <= max_seq:
        return max_seq
    raise ValueError(f"prefill length {n} exceeds max_seq_len {max_seq}")


def _bucket_pow2(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def tth_bucket(n: int) -> int:
    """Static trailing-text bucket: ONE size for every text up to the cap.

    The executable signature includes the trailing-text array, so a per-text
    pow2 bucket would mean a full recompile of the decode/fused-vocode
    executables per text-length class — minutes each through a remote
    compiler. Text positions past the real text already resolve to tts_pad
    (reference generate.py:168-171), so padding to one static size is
    semantics-invariant; the per-step gather over 256 rows is noise. Longer
    texts (rare; the demo caps at 1000 chars) fall back to pow2 buckets.
    """
    cap = int(os.environ.get("FQ3T_TTH_BUCKET", "256"))
    return cap if n <= cap else _bucket_pow2(n, lo=cap)


def _pad_left(tie: np.ndarray, mask: np.ndarray, bucket: int) -> Tuple[np.ndarray, np.ndarray]:
    B, P, H = tie.shape
    if P == bucket:
        return tie, mask
    out = np.zeros((B, bucket, H), tie.dtype)
    m = np.zeros((B, bucket), mask.dtype)
    out[:, bucket - P :] = tie
    m[:, bucket - P :] = mask
    return out, m


def _pad_trailing(tth: np.ndarray, tpe: np.ndarray, bucket: int) -> np.ndarray:
    """Pad trailing text hiddens to a bucket with the pad embedding. Semantics
    are invariant: positions past the real text already resolve to tts_pad
    (reference generate.py:168-171)."""
    B, T, H = tth.shape
    if T == bucket:
        return tth
    out = np.tile(np.asarray(tpe).reshape(1, 1, H), (B, bucket, 1)).astype(tth.dtype)
    out[:, :T] = tth
    return out


class GenerationSession:
    """One request's device state + chunk pump."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: Qwen3TTSConfig,
        tie: np.ndarray,
        attention_mask: np.ndarray,
        trailing_text: np.ndarray,
        tts_pad_embed: np.ndarray,
        max_seq_len: int,
        sampling: SamplingParams,
        pred_sampling: SamplingParams,
        min_new_tokens: int,
        seed: Optional[int] = None,
        dtype=None,
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.sampling = sampling
        self.pred_sampling = pred_sampling
        self.min_new_tokens = min_new_tokens
        # Activations must match the parameter dtype (fp32 parity mode uses
        # fp32 weights end-to-end, reference test_e2e_parity.py:236-252).
        dtype = params["talker"]["codec_embed"].dtype

        P = tie.shape[1]
        bucket = prefill_bucket(P, max_seq_len)
        tie_b, mask_b = _pad_left(tie, attention_mask, bucket)
        t_bucket = tth_bucket(trailing_text.shape[1])
        tth_b = _pad_trailing(trailing_text, tts_pad_embed, t_bucket)

        self.mesh = mesh
        self._dp_axis = None
        if mesh is not None:
            # Multi-chip: batch over dp (if divisible), everything else
            # replicated — GSPMD propagates the KV/activation shardings from
            # here and from the TP-sharded weights (parallel/mesh.py).
            from jax.sharding import NamedSharding, PartitionSpec as PS

            B = tie_b.shape[0]
            dp = "dp" if B % mesh.shape["dp"] == 0 and mesh.shape["dp"] > 1 else None
            self._dp_axis = dp
            put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
            self.tie = put(jnp.asarray(tie_b, dtype), PS(dp, None, None))
            self.mask = put(jnp.asarray(mask_b, jnp.int32), PS(dp, None))
            self.tth = put(jnp.asarray(tth_b, dtype), PS(dp, None, None))
            self.tpe = put(jnp.asarray(tts_pad_embed, dtype), PS(None, None, None))
        else:
            self.tie = jnp.asarray(tie_b, dtype)
            self.mask = jnp.asarray(mask_b, jnp.int32)
            self.tth = jnp.asarray(tth_b, dtype)
            self.tpe = jnp.asarray(tts_pad_embed, dtype)

        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**31 - 1))
        self.key = jax.random.PRNGKey(seed)
        self.max_seq_len = max_seq_len
        self.state = None
        self.prefill_ms = 0.0

    def prefill(self, block: bool = True) -> None:
        """Dispatch the prefill. With block=False it stays async (the first
        chunk fetch syncs it) — saves one tunnel round trip of TTFA."""
        t0 = time.perf_counter()
        state, _ = aot.call(
            "start_state",
            core.start_state,
            talker_params=self.params["talker"],
            talker_cfg=self.cfg.talker,
            embeds=self.tie,
            pad_mask=self.mask,
            key=self.key,
            max_seq=self.max_seq_len,
            sampling=self.sampling,
            min_new_tokens=self.min_new_tokens,
        )
        self.state = state
        if block:
            np.asarray(state.token)  # force the round trip (honest timing)
            self.prefill_ms = (time.perf_counter() - t0) * 1000.0

    def decode_chunk_async(self, chunk_size: int) -> jax.Array:
        """Dispatch one fused chunk; returns the packed device array WITHOUT
        fetching (lets the caller pipeline dispatch-ahead)."""
        self.state, packed = aot.call(
            "decode_chunk",
            core.decode_chunk,
            talker_params=self.params["talker"],
            pred_params=self.params["predictor"],
            talker_cfg=self.cfg.talker,
            pred_cfg=self.cfg.predictor,
            state=self.state,
            trailing_text=self.tth,
            tts_pad_embed=self.tpe,
            chunk_size=chunk_size,
            sampling=self.sampling,
            pred_sampling=self.pred_sampling,
            min_new_tokens=self.min_new_tokens,
        )
        return packed

    @staticmethod
    def materialize(packed: jax.Array) -> Tuple[np.ndarray, bool]:
        """ONE device->host fetch -> (valid frames [n,16] int32, done).
        Stream 0 view — the single-request serving path."""
        arr = np.asarray(packed)  # [chunk, B, 18]
        valid = arr[:, 0, -2].astype(bool)
        done = bool(arr[0, 0, -1])
        return arr[valid, 0, :-2].astype(np.int32), done

    @staticmethod
    def materialize_batch(packed: jax.Array):
        """ONE fetch -> per-stream views for batched serving:
        (frames [chunk, B, 16] int32, valid [chunk, B] bool, done [B] bool)."""
        arr = np.asarray(packed)
        frames = arr[:, :, :-2].astype(np.int32)
        valid = arr[:, :, -2].astype(bool)
        done = arr[0, :, -1].astype(bool)
        return frames, valid, done

    def decode_chunk(self, chunk_size: int) -> Tuple[np.ndarray, bool]:
        return self.materialize(self.decode_chunk_async(chunk_size))

    # -- fused decode+vocode streaming (engine/fused_stream.py) ---------------

    def _put_hist(self, arr: np.ndarray) -> jax.Array:
        """Commit a codec-history window, dp-sharded under a mesh so the
        fused vocode executable partitions its batch lanes like the decode
        state (GSPMD propagates from the inputs)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            return jax.device_put(
                jnp.asarray(arr, jnp.int32),
                NamedSharding(self.mesh, PS(self._dp_axis, None, None)),
            )
        return jnp.asarray(arr, jnp.int32)

    def set_codec_history(self, frames: np.ndarray, ctx: int) -> None:
        """Upload the rolling codec context window (last `ctx` frames)."""
        self.hist = self._put_hist(frames[-ctx:][None])

    def set_codec_history_batch(self, frames_b: np.ndarray, ctx: int) -> None:
        """Per-slot context windows for batched fused vocode: frames_b
        [B, >=ctx, 16] (each slot's own history/ICL-reference tail)."""
        self.hist = self._put_hist(frames_b[:, -ctx:])

    def decode_chunk_fused_async(self, chunk_size: int, ctx: int) -> jax.Array:
        from . import fused_stream

        if ctx == 0:
            B = self.tie.shape[0]
            hist = self._put_hist(
                np.zeros((B, 1, self.cfg.talker.num_code_groups), np.int32)
            )
        else:
            hist = self.hist
        self.state, self.hist, flat = fused_stream.decode_chunk_fused(
            self.params["talker"],
            self.params["predictor"],
            self.params["codec"],
            self.cfg.talker,
            self.cfg.predictor,
            self.cfg.codec,
            self.state,
            hist,
            self.tth,
            self.tpe,
            chunk_size,
            ctx,
            self.sampling,
            self.pred_sampling,
            self.min_new_tokens,
        )
        return flat

    def materialize_fused(self, flat: jax.Array, chunk_size: int):
        from . import fused_stream

        return fused_stream.split_fused_output(
            flat, chunk_size, 1, self.cfg.talker.num_code_groups, self.cfg.codec.total_upsample
        )

    def materialize_fused_batch(self, flat: jax.Array, chunk_size: int):
        from . import fused_stream

        return fused_stream.split_fused_output_batch(
            flat, chunk_size, self.tie.shape[0],
            self.cfg.talker.num_code_groups, self.cfg.codec.total_upsample,
        )


def fast_generate(
    params,
    cfg: Qwen3TTSConfig,
    tie,
    attention_mask,
    trailing_text,
    tts_pad_embed,
    max_seq_len: int = 2048,
    max_new_tokens: int = 2048,
    min_new_tokens: int = 2,
    temperature: float = 0.9,
    top_k: int = 50,
    top_p: float = 1.0,
    do_sample: bool = True,
    repetition_penalty: float = 1.05,
    subtalker_dosample: Optional[bool] = None,
    subtalker_top_k: Optional[int] = None,
    subtalker_top_p: Optional[float] = None,
    subtalker_temperature: Optional[float] = None,
    seed: Optional[int] = None,
    device_chunk: int = 32,
) -> Tuple[Optional[np.ndarray], Dict[str, Any]]:
    """Non-streaming generation -> ([T,16] codes, timing). Mirrors the fast
    path of reference generate.py:99-215 (device_chunk frames per dispatch
    instead of per-step host syncs)."""
    sampling = SamplingParams(temperature, top_k, top_p, do_sample, repetition_penalty)
    pred_sampling = predictor_sampling(
        subtalker_dosample, subtalker_top_k, subtalker_top_p, subtalker_temperature
    )
    sess = GenerationSession(
        params, cfg, tie, attention_mask, trailing_text, tts_pad_embed,
        max_seq_len, sampling, pred_sampling, min_new_tokens, seed,
    )
    sess.prefill()

    t0 = time.perf_counter()
    chunks = []
    steps = 0
    while steps < max_new_tokens:
        # Always dispatch the SAME static chunk size (one compiled executable);
        # overshoot past max_new_tokens is trimmed on host.
        frames, done = sess.decode_chunk(device_chunk)
        frames = frames[: max_new_tokens - steps]
        if frames.shape[0]:
            chunks.append(frames)
            steps += frames.shape[0]
        if done:
            break
    decode_s = time.perf_counter() - t0

    timing = {
        "prefill_ms": sess.prefill_ms,
        "decode_s": decode_s,
        "steps": steps,
        "ms_per_step": (decode_s / steps * 1000.0) if steps else 0.0,
        "steps_per_s": (steps / decode_s) if decode_s > 0 else 0.0,
    }
    if not chunks:
        return None, timing
    return np.concatenate(chunks, axis=0), timing


def fast_generate_streaming(
    params,
    cfg: Qwen3TTSConfig,
    tie,
    attention_mask,
    trailing_text,
    tts_pad_embed,
    max_seq_len: int = 2048,
    max_new_tokens: int = 2048,
    min_new_tokens: int = 2,
    temperature: float = 0.9,
    top_k: int = 50,
    top_p: float = 1.0,
    do_sample: bool = True,
    repetition_penalty: float = 1.05,
    chunk_size: int = 12,
    seed: Optional[int] = None,
    subtalker_dosample: Optional[bool] = None,
    subtalker_top_k: Optional[int] = None,
    subtalker_top_p: Optional[float] = None,
    subtalker_temperature: Optional[float] = None,
) -> Generator[Tuple[np.ndarray, Dict[str, Any]], None, None]:
    """Streaming generation: yields ([chunk,16] codes, timing) per chunk.

    The device chunk granularity IS the streaming chunk (one fused scan per
    yielded chunk), so the host sync that paces the stream is the only one.
    Protocol matches reference streaming.py:99-188.
    """
    sampling = SamplingParams(temperature, top_k, top_p, do_sample, repetition_penalty)
    pred_sampling = predictor_sampling(
        subtalker_dosample, subtalker_top_k, subtalker_top_p, subtalker_temperature
    )
    sess = GenerationSession(
        params, cfg, tie, attention_mask, trailing_text, tts_pad_embed,
        max_seq_len, sampling, pred_sampling, min_new_tokens, seed,
    )
    # Async prefill: the first chunk's fetch syncs it (one fewer round trip
    # on the TTFA path). prefill_ms is folded into the first decode_ms.
    sess.prefill(block=False)

    total = 0
    chunk_index = 0
    pending = sess.decode_chunk_async(chunk_size)
    while total < max_new_tokens:
        t0 = time.perf_counter()
        frames, done = sess.materialize(pending)
        pending = None
        frames = frames[: max_new_tokens - total]
        decode_ms = (time.perf_counter() - t0) * 1000.0
        stream_done = done or (total + frames.shape[0]) >= max_new_tokens
        # Dispatch-ahead from the second chunk on: chunk k+1 computes on
        # device while the consumer vocodes chunk k. (Not on chunk 0 — the
        # first codec decode must not queue behind chunk 1, that's TTFA.)
        if not stream_done and chunk_index >= 1:
            pending = sess.decode_chunk_async(chunk_size)
        if frames.shape[0]:
            total += frames.shape[0]
            yield frames, {
                "chunk_index": chunk_index,
                "chunk_steps": int(frames.shape[0]),
                "prefill_ms": sess.prefill_ms if chunk_index == 0 else 0.0,
                "decode_ms": decode_ms,
                "total_steps_so_far": total,
                "is_final": bool(stream_done),
            }
            chunk_index += 1
        if stream_done:
            break
        if pending is None:
            pending = sess.decode_chunk_async(chunk_size)


def fast_generate_streaming_batch(
    params,
    cfg: Qwen3TTSConfig,
    tie,
    attention_mask,
    trailing_text,
    tts_pad_embed,
    max_seq_len: int = 2048,
    max_new_tokens: int = 2048,
    min_new_tokens: int = 2,
    temperature: float = 0.9,
    top_k: int = 50,
    top_p: float = 1.0,
    do_sample: bool = True,
    repetition_penalty: float = 1.05,
    chunk_size: int = 12,
    seed: Optional[int] = None,
    mesh=None,
    context_frames: int = CONTEXT_FRAMES,
    first_chunk_size: Optional[int] = None,
    ref_codes_list: Optional[List[Optional[np.ndarray]]] = None,
    subtalker_dosample: Optional[bool] = None,
    subtalker_top_k: Optional[int] = None,
    subtalker_top_p: Optional[float] = None,
    subtalker_temperature: Optional[float] = None,
) -> Generator[
    Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray], Dict[str, Any]],
    None, None,
]:
    """Batched streaming decode: B independent streams in lockstep on one
    engine batch (optionally sharded over a dp mesh axis).

    tie/attention_mask/trailing_text: [B, ...] stacked left-padded prompts.
    Yields (frames [chunk, B, 16] int32, valid [chunk, B] bool,
    done [B] bool, audio [B, chunk*up] f32 or None, timing) once per device
    chunk, with dispatch-ahead. Streams that hit EOS keep their slot (masked
    invalid) until every stream finishes — the compiled executable never
    changes shape. This is the serving mode the reference lacks (it
    serializes requests behind a mutex, reference openai_server.py:71;
    SURVEY §2.3 maps the TPU-native answer).

    Device-side batched vocode: when every slot is non-ICL (ref_codes_list
    all None) or every slot carries >= context_frames of ICL reference codes,
    each chunk's windowed vocode for ALL B slots is fused into the decode
    executable — one dispatch + one fetch per chunk, B host codec decodes
    eliminated (the batched extension of the single-stream fused path,
    fused_stream.py). The per-slot window lanes are independent, so each
    slot's samples are window-local-exact like the solo fused stream. Audio
    is None per chunk when the batch is ineligible (mixed/short refs, mesh
    without fused support disabled via FQ3T_FUSED_VOCODE=0) — the caller
    vocodes host-side then.
    """
    import os

    from . import fused_stream

    sampling = SamplingParams(temperature, top_k, top_p, do_sample, repetition_penalty)
    pred_sampling = predictor_sampling(
        subtalker_dosample, subtalker_top_k, subtalker_top_p, subtalker_temperature
    )
    sess = GenerationSession(
        params, cfg, tie, attention_mask, trailing_text, tts_pad_embed,
        max_seq_len, sampling, pred_sampling, min_new_tokens, seed, mesh=mesh,
    )
    sess.prefill(block=False)
    sess.hist = None

    B = tie.shape[0]
    refs = list(ref_codes_list) if ref_codes_list is not None else [None] * B
    # Fused vocode under a (dp, tp) mesh too: the hist/packed inputs carry dp
    # shardings (GenerationSession._put_hist), so GSPMD partitions the
    # B-lane windowed vocode across dp exactly like the decode state — one
    # dispatch + one fetch per chunk for the whole batch instead of B
    # sequential host codec decodes (VERDICT r4 next #5).
    fused_enabled = os.environ.get("FQ3T_FUSED_VOCODE", "1") != "0"
    icl_fused = fused_enabled and all(
        r is not None and r.shape[0] >= context_frames for r in refs
    )
    use_fused = icl_fused or (fused_enabled and all(r is None for r in refs))
    first_cs = first_chunk_size or chunk_size

    totals = np.zeros(B, np.int64)
    chunk_index = 0
    n_decoded = 0  # frames dispatched per lane (lockstep, validity-blind)
    # Rolling per-lane frame tail [B, <=context_frames, 16] for hist rebuilds
    # (ICL lanes start with their reference tails prepended).
    ncg = cfg.talker.num_code_groups
    if icl_fused:
        tail = np.stack(
            [np.asarray(r, np.int32)[-context_frames:] for r in refs], axis=0
        )
    else:
        tail = np.zeros((B, 0, ncg), np.int32)

    def dispatch():
        cs = first_cs if n_decoded == 0 else chunk_size
        if not use_fused:
            return ("plain", sess.decode_chunk_async(cs), cs)
        if icl_fused:
            # Reference tails give every lane a full steady-state window from
            # chunk 0 (the batched analog of the single-stream ICL fusion).
            ctx = context_frames
        elif n_decoded == 0:
            return ("fused0", sess.decode_chunk_fused_async(cs, 0), cs)
        else:
            ctx = min(n_decoded, context_frames)
        # The device hist carry is only valid at matching width (a fused0 or
        # smaller-ctx chunk leaves it short) — rebuild from the host tail then.
        if sess.hist is None or sess.hist.shape[1] != ctx:
            sess.set_codec_history_batch(tail, ctx)
        return ("fused", sess.decode_chunk_fused_async(cs, ctx), cs)

    pending = dispatch()
    while True:
        t0 = time.perf_counter()
        kind, dev, cs = pending
        pending = None
        if kind == "plain":
            frames, valid, done = sess.materialize_batch(dev)
            audio = None
        else:
            audio, frames, valid, done = sess.materialize_fused_batch(dev, cs)
        n_decoded += cs
        if use_fused:
            tail = np.concatenate(
                [tail, np.transpose(frames, (1, 0, 2))], axis=1
            )[:, -context_frames:]
        # clip each stream to its token budget
        cum = valid.cumsum(axis=0) + totals[None, :]
        valid = valid & (cum <= max_new_tokens)
        totals += valid.sum(axis=0)
        decode_ms = (time.perf_counter() - t0) * 1000.0
        stream_done = bool(np.all(done | (totals >= max_new_tokens)))
        if not stream_done:
            pending = dispatch()
        yield frames, valid, done, audio, {
            "chunk_index": chunk_index,
            "prefill_ms": sess.prefill_ms if chunk_index == 0 else 0.0,
            "decode_ms": decode_ms,
            "total_steps_so_far": totals.copy(),
            "is_final": stream_done,
            "fused": kind != "plain",
            "first_window": kind == "fused0",
        }
        chunk_index += 1
        if stream_done:
            break


def fast_generate_streaming_fused(
    params,
    cfg: Qwen3TTSConfig,
    tie,
    attention_mask,
    trailing_text,
    tts_pad_embed,
    max_seq_len: int = 2048,
    max_new_tokens: int = 2048,
    min_new_tokens: int = 2,
    temperature: float = 0.9,
    top_k: int = 50,
    top_p: float = 1.0,
    do_sample: bool = True,
    repetition_penalty: float = 1.05,
    chunk_size: int = 12,
    seed: Optional[int] = None,
    context_frames: int = CONTEXT_FRAMES,
    fuse_first_chunk: bool = False,
    first_chunk_size: Optional[int] = None,
    ref_codes: Optional[np.ndarray] = None,
    subtalker_dosample: Optional[bool] = None,
    subtalker_top_k: Optional[int] = None,
    subtalker_top_p: Optional[float] = None,
    subtalker_temperature: Optional[float] = None,
) -> Generator[Tuple[np.ndarray, Optional[np.ndarray], Dict[str, Any]], None, None]:
    """Streaming generation with the fused decode+vocode path.

    Yields (frames [n,16], audio [m] float32 or None, timing). Audio comes
    straight out of the fused executable for the first chunk (ctx=0) and for
    steady-state chunks once `context_frames` of history exist; in-between
    chunks yield audio=None and the caller vocodes them host-side (the
    reference's phase-1 accumulated decode, model.py:1085-1114). Set
    fuse_first_chunk=False when the caller must prepend ICL reference codes
    to the very first vocoder call.

    ref_codes: ICL reference codec tokens [R, 16]. With R >= context_frames
    the reference tail IS the vocoder's left-context window from chunk 0 on,
    so EVERY chunk — including the first — runs the steady-state fused
    executable (ctx=context_frames): one dispatch + one fetch, no host codec
    on the TTFA path. This is the TPU-native answer to the reference's ICL
    prepend-then-trim phase 1 (reference model.py:919-923, 1085-1114): the
    window emission [ctx*up - D, (ctx+chunk)*up - D) excludes the reference
    audio by construction instead of by proportional trim, and matches what
    the non-ICL stream converges to at steady state. Short references
    (R < context_frames) keep the host prepend path (fuse_first_chunk=False).

    first_chunk_size (default = chunk_size): a SMALLER first chunk cuts TTFA
    by the skipped frames' decode time — the first audio block shrinks
    (e.g. 4 frames = 320 ms) but stays far above the steady-state chunk
    cycle, so playback never underruns.
    """
    from . import fused_stream

    sampling = SamplingParams(temperature, top_k, top_p, do_sample, repetition_penalty)
    pred_sampling = predictor_sampling(
        subtalker_dosample, subtalker_top_k, subtalker_top_p, subtalker_temperature
    )
    sess = GenerationSession(
        params, cfg, tie, attention_mask, trailing_text, tts_pad_embed,
        max_seq_len, sampling, pred_sampling, min_new_tokens, seed,
    )
    sess.prefill(block=False)
    sess.hist = None
    up = cfg.codec.total_upsample
    D = fused_stream.codec_deficit(cfg.codec)

    history: list = []
    total = 0
    chunk_index = 0
    first_cs = first_chunk_size or chunk_size

    import os

    # Device-side vocode fusion is DEFAULT-ON (TTFA/RTF path: the whole
    # chunk — AR decode, sampling, windowed vocode — is one device program,
    # one fetch). FQ3T_FUSED_VOCODE=0 opts out for deployments where the
    # extra codec-window compiles are not worth it.
    fused_enabled = os.environ.get("FQ3T_FUSED_VOCODE", "1") != "0"
    # ICL with a long-enough reference: the ref tail provides the full
    # steady-state window from frame 0, so ctx is context_frames for EVERY
    # chunk — one (decode, vocode) executable pair, warm from warmup().
    icl_fused = (
        fused_enabled
        and ref_codes is not None
        and ref_codes.shape[0] >= context_frames
    )

    def dispatch(idx: int):
        """Queue the chunk with index `idx` on the device.

        Non-ICL streams are fused END TO END: the window context grows
        min(total, context_frames), so every chunk (0, 8, 16, 24, 24, ...)
        is one device program + one fetch and the host codec path is never
        touched (each growing ctx is its own compiled executable; sample
        offsets stay exactly contiguous because chunk k emits window-local
        [ctx*up - D, (ctx+chunk)*up - D)). ICL keeps the host accumulated
        decode until `context_frames` of generated frames exist, because its
        early vocoder calls must prepend the reference codes
        (reference model.py:919-923, 1085-1114)."""
        cs = first_cs if total == 0 else chunk_size
        if not fused_enabled:
            return ("plain", sess.decode_chunk_async(cs), cs)
        if icl_fused:
            ctx = context_frames
            if sess.hist is None or sess.hist.shape[1] != ctx:
                src = (
                    np.concatenate([ref_codes] + history, axis=0)
                    if history
                    else np.asarray(ref_codes)
                )
                sess.set_codec_history(src, ctx)
            return ("fused", sess.decode_chunk_fused_async(cs, ctx), cs)
        if total == 0:
            if fuse_first_chunk:
                return ("fused0", sess.decode_chunk_fused_async(cs, 0), cs)
            return ("plain", sess.decode_chunk_async(cs), cs)
        if not fuse_first_chunk and total < context_frames:
            return ("plain", sess.decode_chunk_async(cs), cs)  # ICL warm-in
        ctx = min(total, context_frames)
        # The device-side hist carry is only valid if it holds exactly `ctx`
        # frames (a preceding plain/fused0/smaller-ctx chunk leaves it
        # stale/short) — rebuild it from host history then.
        if sess.hist is None or sess.hist.shape[1] != ctx:
            sess.set_codec_history(np.concatenate(history, axis=0), ctx)
        return ("fused", sess.decode_chunk_fused_async(cs, ctx), cs)

    debug = os.environ.get("FQ3T_DEBUG_STREAM") == "1"
    pending = dispatch(0)
    if debug:
        import sys

        print(f"[stream-debug] dispatched chunk 0 kind={pending[0]}", file=sys.stderr, flush=True)
    while total < max_new_tokens:
        t0 = time.perf_counter()
        kind, dev, cs = pending
        pending = None
        if debug:
            import sys

            tok = np.asarray(sess.state.token)
            print(f"[stream-debug] decode chain done (token={tok.ravel()[:1]}), fetching {kind}...",
                  file=sys.stderr, flush=True)
        if kind == "plain":
            frames, done = sess.materialize(dev)
            audio = None
            frames = frames[: max_new_tokens - total]
        else:
            audio_full, frames, done, _emitted = sess.materialize_fused(dev, cs)
            # clip to the token budget BEFORE slicing audio, so the audio
            # stops exactly at the last kept frame
            frames = frames[: max_new_tokens - total]
            v = frames.shape[0]
            n_emit = max(v * up - D, 0) if kind == "fused0" else v * up
            audio = audio_full[0, :n_emit]
        decode_ms = (time.perf_counter() - t0) * 1000.0
        stream_done = done or (total + frames.shape[0]) >= max_new_tokens
        if frames.shape[0]:
            history.append(frames)
            if kind == "plain":
                sess.hist = None  # device window stale; re-upload on next fused
            total += frames.shape[0]
        elif not done:
            # A chunk with zero valid frames and no EOS means the engine is
            # not advancing (e.g. corrupted flags). Fail loudly: silently
            # re-dispatching spins forever with no output.
            raise RuntimeError(
                f"decode chunk {chunk_index} returned 0 valid frames without EOS "
                f"(kind={kind}, total={total}) — engine state is not advancing"
            )
        # dispatch-ahead from the second chunk on (chunk 0's audio path must
        # not queue behind chunk 1 — that is the TTFA path)
        if not stream_done and chunk_index >= 1:
            pending = dispatch(chunk_index + 1)
        if frames.shape[0]:
            yield frames, audio, {
                "chunk_index": chunk_index,
                "chunk_steps": int(frames.shape[0]),
                "prefill_ms": sess.prefill_ms if chunk_index == 0 else 0.0,
                "decode_ms": decode_ms,
                "total_steps_so_far": total,
                "is_final": bool(stream_done),
            }
            chunk_index += 1
        if stream_done:
            break
        if pending is None:
            pending = dispatch(chunk_index)
