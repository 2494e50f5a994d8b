#!/usr/bin/env python3
"""Batched-serving throughput: frames/s/stream and aggregate frames/s vs B.

The reference serves one request at a time behind a mutex (SURVEY §2.3,
reference openai_server.py:71); this engine keeps a leading batch dim so one
chip decodes B independent streams in lockstep. This harness measures how
much aggregate throughput that buys (AR decode is HBM-bandwidth-bound, so
batching amortizes the weight streaming almost for free until the MXU or
VMEM saturates).

Two modes:
  default  engine-level decode-only (core.decode_chunk on a [B, ...] batch) —
           isolates the decode scaling.
  --e2e    END TO END through the PUBLIC API
           (generate_voice_clone_streaming_batch): per-slot TTFA and
           per-stream/aggregate RTF including vocoding — device-fused for
           uniform batches, per-slot host codec otherwise (VERDICT r3 #5:
           the decode-only numbers hid the vocode cost).

Usage: python benchmarks/multistream.py [--model 0.6b] [--batches 1,2,4,8]
       python benchmarks/multistream.py --e2e [--runs 3]
Writes bench_results_multistream[_e2e].json next to this file.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main_e2e(args):
    """Full serving path: public batched API, decode + vocode, per-slot TTFA."""
    from common import DEFAULT_TEXT, load_model, save_results, xvec_prompt

    model = load_model(args.model, args.quant)
    model.warmup(prefill_len=64, chunk_sizes=(args.chunk,), first_chunk_size=4)

    texts = [
        DEFAULT_TEXT,
        "A second, slightly different sentence keeps the prompts distinct.",
        "Stream three reads a third text so the lockstep batch is honest.",
        "The fourth stream gets its own words too, for the same reason.",
    ]
    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        requests = [
            {"text": texts[s % len(texts)], "xvec_only": True,
             "voice_clone_prompt": xvec_prompt(seed=s)}
            for s in range(B)
        ]

        def run_once(seed):
            t0 = time.perf_counter()
            ttfa = [None] * B
            samples = np.zeros(B)
            frames = np.zeros(B)
            sr = model.sample_rate
            for slot, audio, sr, timing in model.generate_voice_clone_streaming_batch(
                requests, chunk_size=args.chunk, first_chunk_size=4,
                max_new_tokens=args.frames, seed=seed,
            ):
                now = time.perf_counter() - t0
                if ttfa[slot] is None:
                    ttfa[slot] = now * 1000
                samples[slot] += len(audio)
                frames[slot] = timing["total_steps_so_far"]
            wall = time.perf_counter() - t0
            return ttfa, samples / sr, frames, wall, timing.get("fused", False)

        run_once(0)  # warm the B-shaped executables
        ttfas, rtfs, aggs, fused = [], [], [], False
        for r in range(args.runs):
            ttfa, audio_s, frames, wall, fused = run_once(r + 1)
            ttfas.extend(t for t in ttfa if t is not None)
            rtfs.extend(audio_s / wall)
            aggs.append(float(audio_s.sum() / wall))
        rows.append({
            "batch": B,
            "fused_vocode": bool(fused),
            "ttfa_ms_p50": round(float(np.median(ttfas)), 1),
            "ttfa_ms_max": round(float(np.max(ttfas)), 1),
            "rtf_per_stream_p50": round(float(np.median(rtfs)), 2),
            "rtf_per_stream_min": round(float(np.min(rtfs)), 2),
            "rtf_aggregate": round(float(np.median(aggs)), 2),
            "runs": args.runs,
        })
        print(f"B={B}: {rows[-1]}", file=sys.stderr, flush=True)

    out = {"model": args.model, "quant": args.quant, "chunk": args.chunk,
           "frames": args.frames, "rows": rows}
    save_results("multistream_e2e", out)
    print(json.dumps(out))


def main_continuous(args):
    """Staggered admission through ContinuousBatcher (VERDICT r4 next #6).

    Requests ARRIVE over time (spaced --arrival-ms apart, a serving arrival
    process, not a synthetic all-at-t0 burst) and each joins the RUNNING
    batch at the next chunk boundary: per-stream TTFA is measured from its
    own submit. Contrast row: the lockstep batched API admits all B prompts
    at once, so every stream's TTFA carries all B prefills + the widest
    first chunk (the 101->515 ms degradation in the r4 e2e capture)."""
    import threading

    from common import DEFAULT_TEXT, load_model, save_results, xvec_prompt

    model = load_model(args.model, args.quant)
    model.warmup(prefill_len=64, chunk_sizes=(args.chunk,), first_chunk_size=4)

    texts = [
        DEFAULT_TEXT,
        "A second, slightly different sentence keeps the prompts distinct.",
        "Stream three reads a third text so the lockstep batch is honest.",
        "The fourth stream gets its own words too, for the same reason.",
    ]
    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        requests = [
            {"text": texts[s % len(texts)], "xvec_only": True,
             "voice_clone_prompt": xvec_prompt(seed=s)}
            for s in range(B)
        ]

        def run_once(seed):
            cb = model.continuous_batcher(
                max_slots=B, chunk_size=args.chunk,
                first_chunk_size=args.first_chunk or None,
                max_new_tokens=args.frames, seed=seed,
            )
            t0 = time.perf_counter()

            def feeder():
                for i, r in enumerate(requests):
                    delay = t0 + i * args.arrival_ms / 1000.0 - time.perf_counter()
                    if delay > 0:
                        time.sleep(delay)
                    cb.submit(r)
                cb.close()

            th = threading.Thread(target=feeder, daemon=True)
            th.start()
            ttfa, samples, frames = {}, {}, {}
            for sid, audio, sr, timing in cb.run(wait=True):
                ttfa.setdefault(sid, timing["ttfa_from_submit_ms"])
                samples[sid] = samples.get(sid, 0) + len(audio)
                frames[sid] = timing["total_steps_so_far"]
            th.join()
            wall = time.perf_counter() - t0
            audio_s = np.array([samples[s] for s in sorted(samples)]) / model.sample_rate
            return list(ttfa.values()), audio_s, wall

        run_once(0)  # warm the B-shaped executables (incl. insert_slot)
        ttfas, aggs = [], []
        for r in range(args.runs):
            tt, audio_s, wall = run_once(r + 1)
            ttfas.extend(tt)
            aggs.append(float(audio_s.sum() / wall))
        rows.append({
            "batch": B,
            "arrival_ms": args.arrival_ms,
            "ttfa_from_submit_ms_p50": round(float(np.median(ttfas)), 1),
            "ttfa_from_submit_ms_max": round(float(np.max(ttfas)), 1),
            "rtf_aggregate": round(float(np.median(aggs)), 2),
            "runs": args.runs,
        })
        print(f"B={B}: {rows[-1]}", file=sys.stderr, flush=True)

    out = {"model": args.model, "quant": args.quant, "chunk": args.chunk,
           "first_chunk": args.first_chunk or args.chunk,
           "frames": args.frames, "mode": "continuous", "rows": rows}
    save_results("multistream_continuous", out)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="0.6b", choices=["0.6b", "1.7b"])
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=8, help="timed chunks per batch size")
    ap.add_argument("--quant", default="Q8_0")
    ap.add_argument("--prefill", type=int, default=64)
    ap.add_argument("--e2e", action="store_true",
                    help="public-API end-to-end (decode + vocode + TTFA)")
    ap.add_argument("--continuous", action="store_true",
                    help="staggered admission via ContinuousBatcher")
    ap.add_argument("--first-chunk", type=int, default=0,
                    help="solo admission chunk size (continuous mode; "
                         "0 = chunk_size)")
    ap.add_argument("--arrival-ms", type=float, default=150.0,
                    help="spacing between request arrivals (continuous mode)")
    ap.add_argument("--runs", type=int, default=3, help="timed e2e runs per B")
    ap.add_argument("--frames", type=int, default=96, help="max frames per e2e stream")
    args = ap.parse_args()

    if args.continuous:
        main_continuous(args)
        return
    if args.e2e:
        main_e2e(args)
        return

    import jax
    import jax.numpy as jnp

    from common import enable_compile_cache

    enable_compile_cache()  # opt-in via FQ3T_JAX_CACHE

    from faster_qwen3_tts_tpu import weights as weights_lib
    from faster_qwen3_tts_tpu.config import get_config
    from faster_qwen3_tts_tpu.engine import core
    from faster_qwen3_tts_tpu.ops import quant as quant_lib
    from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

    name = {"0.6b": "Qwen/Qwen3-TTS-12Hz-0.6B-Base",
            "1.7b": "Qwen/Qwen3-TTS-12Hz-1.7B-Base"}[args.model]
    cfg = get_config(name)
    print(f"backend={jax.default_backend()} model={args.model} quant={args.quant}",
          file=sys.stderr)
    # device-side init + in-HBM quantization: seconds instead of ~10 min of
    # host RNG + transfer through a tunneled chip
    params = weights_lib.init_all_device(cfg, seed=0, dtype=jnp.bfloat16)
    params = {"talker": params["talker"], "predictor": params["predictor"]}
    mode = quant_lib.resolve_quant_name(args.quant)
    if mode != "none":
        params = quant_lib.quantize_model_params(params, mode)
    import os as _os

    if _os.environ.get("FQ3T_FUSE_QKV", "0") == "1":
        params = quant_lib.fuse_layer_weights(params)

    H = cfg.talker.hidden_size
    sampling = SamplingParams()
    max_seq = 1024
    rows = []
    rng = np.random.default_rng(0)

    for B in [int(b) for b in args.batches.split(",")]:
        tie = jnp.asarray(
            rng.standard_normal((B, args.prefill, H)).astype(np.float32) * 0.02,
            jnp.bfloat16,
        )
        mask = jnp.ones((B, args.prefill), jnp.int32)
        tth = jnp.zeros((B, 16, H), jnp.bfloat16)
        tpe = jnp.zeros((B, 1, H), jnp.bfloat16)
        state, _ = core.start_state(
            params["talker"], cfg.talker, tie, mask, jax.random.PRNGKey(0),
            max_seq, sampling, 2,
        )

        def chunk(state):
            return core.decode_chunk(
                params["talker"], params["predictor"], cfg.talker, cfg.predictor,
                state, tth, tpe, args.chunk, sampling, sampling, 2,
            )

        # warm (compile) then time
        state, packed = chunk(state)
        np.asarray(packed)
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            state, packed = chunk(state)
        np.asarray(packed)  # block (tunnel-honest sync)
        dt = time.perf_counter() - t0
        frames = args.chunks * args.chunk
        per_stream = frames / dt
        agg = per_stream * B
        rows.append({
            "batch": B,
            "ms_per_chunk": round(dt / args.chunks * 1000, 2),
            "frames_per_s_per_stream": round(per_stream, 1),
            "frames_per_s_aggregate": round(agg, 1),
            "rtf_per_stream_12hz": round(per_stream / 12.0, 2),
        })
        print(f"B={B}: {rows[-1]}", file=sys.stderr)

    out = {
        "model": args.model,
        "quant": args.quant,
        "chunk": args.chunk,
        "backend": __import__("jax").default_backend(),
        "rows": rows,
    }
    path = Path(__file__).parent / "bench_results_multistream.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
