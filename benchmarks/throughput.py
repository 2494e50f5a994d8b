"""Primary benchmark: TTFA + RTF for the fast path vs the parity path.

Counterpart of reference benchmarks/throughput.py:1-205 (the harness behind
the README tables): streaming TTFA at chunk_size=8, streaming RTF, and the
non-streaming RTF, for the fused fast path and the unfused parity path, with
JSON results persisted per device.

    MODEL_SIZE=0.6b python benchmarks/throughput.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

from common import DEFAULT_TEXT, load_model, save_results, time_stream, xvec_prompt


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    frames = int(os.environ.get("FRAMES", "120"))
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    text = os.environ.get("TEXT", DEFAULT_TEXT)
    runs = int(os.environ.get("RUNS", "3"))

    model = load_model(size, quant)
    prompt = xvec_prompt()

    def stream(seed, parity=False):
        return model.generate_voice_clone_streaming(
            text, "English", voice_clone_prompt=prompt, max_new_tokens=frames,
            chunk_size=chunk, seed=seed, parity_mode=parity,
        )

    # warmup both paths
    print("warmup...", file=sys.stderr)
    for _ in stream(0):
        pass
    for _ in stream(0, parity=True):
        pass
    model.generate_voice_clone(
        text, "English", voice_clone_prompt=prompt, max_new_tokens=frames, seed=0
    )

    fast = time_stream(model, lambda i: stream(i + 1), runs=runs)
    parity = time_stream(model, lambda i: stream(i + 1, parity=True), runs=runs)

    t0 = time.perf_counter()
    audio, sr = model.generate_voice_clone(
        text, "English", voice_clone_prompt=prompt, max_new_tokens=frames, seed=9
    )
    ns_wall = time.perf_counter() - t0
    ns_rtf = len(audio[0]) / sr / ns_wall

    results = {
        "model_size": size,
        "quant": quant,
        "chunk_size": chunk,
        "frames": frames,
        "fast_streaming": fast,
        "parity_streaming": parity,
        "non_streaming_rtf": round(ns_rtf, 3),
    }
    print(
        f"fast: TTFA {fast['ttfa_ms']:.0f}ms RTF {fast['rtf']:.2f} | "
        f"parity: TTFA {parity['ttfa_ms']:.0f}ms RTF {parity['rtf']:.2f} | "
        f"non-streaming RTF {ns_rtf:.2f}"
    )
    save_results(f"throughput_{size}", results)


if __name__ == "__main__":
    main()
