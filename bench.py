#!/usr/bin/env python3
"""Headline benchmark: streaming voice-clone TTFA + RTF on real TPU hardware.

Metric definitions follow the reference exactly (reference README / SURVEY §6):
  RTF  = generated-audio seconds / wall-clock seconds (>1 = faster than
         real-time), full generation including prompt assembly.
  TTFA = time to first playable audio chunk, streaming chunk_size=8.

Baseline to beat: the reference's best published numbers for the same model
size on its best GPU (RTX 4090): 1.7B fast RTF 4.22 / TTFA 174 ms,
0.6B fast RTF 4.78 / TTFA 156 ms (BASELINE.md). `vs_baseline` is
our_RTF / reference_RTF for the benched size.

Weights are random-initialized at the REAL model geometry (no checkpoint in
this environment); compute cost is identical to trained weights. Random
weights never emit EOS, so generation length is capped at --frames.

Prints ONE JSON line on stdout; human-readable detail goes to stderr.
"""
from __future__ import annotations

import argparse
import faulthandler
import json
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BASELINE_RTF = {"0.6b": 4.78, "1.7b": 4.22}
BASELINE_TTFA_MS = {"0.6b": 156.0, "1.7b": 174.0}


def run_bench(model_size: str, frames: int, chunk: int, runs: int, smoke: bool, quant: str = "BF16"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fq3t_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from faster_qwen3_tts_tpu.model import FasterQwen3TTS

    name = f"Qwen/Qwen3-TTS-12Hz-{model_size.upper().replace('B','B')}-Base"
    name = {"0.6b": "Qwen/Qwen3-TTS-12Hz-0.6B-Base", "1.7b": "Qwen/Qwen3-TTS-12Hz-1.7B-Base"}[model_size]
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(f"loading {name} (random-init, real geometry)...")
    model = FasterQwen3TTS.from_pretrained(name, max_seq_len=2048, quant=quant)
    # Reuse the streaming chunk executable for non-streaming decode: each
    # fresh executable costs a full (remote) XLA compile.
    model.device_chunk = chunk
    if smoke:
        frames = min(frames, 24)

    rng = np.random.default_rng(0)
    prompt = {
        "ref_spk_embedding": [rng.standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [True],
        "icl_mode": [False],
        "ref_code": [None],
    }
    # short text keeps the prefill in the smallest bucket (fewer compiles)
    text = "The quick brown fox jumps over the lazy dog today."

    def one_stream_run(seed):
        t_start = time.perf_counter()
        ttfa = None
        audio_samples = 0
        n_frames = 0
        for audio, sr, timing in model.generate_voice_clone_streaming(
            text, "English", voice_clone_prompt=prompt, max_new_tokens=frames,
            chunk_size=chunk, seed=seed,
        ):
            if ttfa is None:
                ttfa = (time.perf_counter() - t_start) * 1000.0
            audio_samples += len(audio)
            n_frames = timing["total_steps_so_far"]
        wall = time.perf_counter() - t_start
        audio_s = audio_samples / model.sample_rate
        return ttfa, audio_s / wall if wall > 0 else 0.0, n_frames, wall

    # warmup runs compile everything (streaming + non-streaming paths)
    log("warmup: streaming path (prefill/decode/vocode compiles)...")
    t0 = time.perf_counter()
    n = 0
    for _ in model.generate_voice_clone_streaming(
        text, "English", voice_clone_prompt=prompt, max_new_tokens=frames,
        chunk_size=chunk, seed=0,
    ):
        n += 1
        log(f"  warmup stream chunk {n} at {time.perf_counter()-t0:.0f}s")
    log(f"warmup: non-streaming path at {time.perf_counter()-t0:.0f}s...")
    model.generate_voice_clone(
        text, "English", voice_clone_prompt=prompt, max_new_tokens=frames, seed=0
    )
    log(f"warmup done in {time.perf_counter()-t0:.1f}s")

    ttfas, rtfs = [], []
    for i in range(runs):
        ttfa, rtf, n, wall = one_stream_run(i + 1)
        log(f"run {i}: TTFA {ttfa:.1f} ms, stream RTF {rtf:.2f} ({n} frames, {wall:.2f}s wall)")
        ttfas.append(ttfa)
        rtfs.append(rtf)

    # non-streaming RTF
    t0 = time.perf_counter()
    audio, sr = model.generate_voice_clone(
        text, "English", voice_clone_prompt=prompt, max_new_tokens=frames, seed=99
    )
    wall = time.perf_counter() - t0
    ns_rtf = (len(audio[0]) / sr) / wall
    log(f"non-streaming RTF {ns_rtf:.2f}")

    p50_ttfa = float(np.median(ttfas))
    p50_rtf = float(np.median(rtfs))
    return {
        "metric": f"stream_rtf_{model_size}_cs{chunk}",
        "value": round(p50_rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(p50_rtf / BASELINE_RTF[model_size], 3),
        "extras": {
            "p50_ttfa_ms": round(p50_ttfa, 1),
            "ttfa_vs_baseline": round(BASELINE_TTFA_MS[model_size] / p50_ttfa, 3),
            "non_streaming_rtf": round(ns_rtf, 3),
            "model_size": model_size,
            "chunk_size": chunk,
            "frames": frames,
            "baseline_rtf_rtx4090": BASELINE_RTF[model_size],
            "baseline_ttfa_ms_rtx4090": BASELINE_TTFA_MS[model_size],
            "quant": quant,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    # flagship default; Q8_0 keeps the decode loop bandwidth-lean and the
    # unattended run completes in ~10 min including load + compiles
    ap.add_argument("--model", default="1.7b", choices=["0.6b", "1.7b"])
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--quant", default="Q8_0")
    args = ap.parse_args()
    result = run_bench(args.model, args.frames, args.chunk, args.runs, args.smoke, args.quant)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
