"""Chunk-size sweep: TTFA vs RTF per chunk size.

Counterpart of reference benchmarks/chunk_sweep.py:1-102 (README chunk table:
cs=1/2/4/8/12 + non-streaming).

    MODEL_SIZE=0.6b python benchmarks/chunk_sweep.py
"""
from __future__ import annotations

import os
import sys
import time

from common import DEFAULT_TEXT, load_model, save_results, time_stream, xvec_prompt


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    frames = int(os.environ.get("FRAMES", "96"))
    sizes = [int(x) for x in os.environ.get("CHUNK_SIZES", "1,2,4,8,12").split(",")]
    model = load_model(size, quant)
    prompt = xvec_prompt()

    rows = {}
    for cs in sizes:
        def stream(seed, cs=cs):
            return model.generate_voice_clone_streaming(
                DEFAULT_TEXT, "English", voice_clone_prompt=prompt,
                max_new_tokens=frames, chunk_size=cs, seed=seed,
            )

        for _ in stream(0):  # warmup/compile this chunk size
            pass
        stats = time_stream(model, lambda i: stream(i + 1), runs=2)
        rows[cs] = stats
        audio_per_chunk_ms = cs / model.config.frame_rate * 1000
        print(
            f"cs={cs:3d}: TTFA {stats['ttfa_ms']:6.0f} ms  RTF {stats['rtf']:5.2f}  "
            f"audio/chunk {audio_per_chunk_ms:.0f} ms"
        )

    t0 = time.perf_counter()
    audio, sr = model.generate_voice_clone(
        DEFAULT_TEXT, "English", voice_clone_prompt=prompt, max_new_tokens=frames, seed=0
    )
    audio, sr = model.generate_voice_clone(
        DEFAULT_TEXT, "English", voice_clone_prompt=prompt, max_new_tokens=frames, seed=1
    )
    wall = time.perf_counter() - t0
    print(f"non-streaming RTF {2 * len(audio[0]) / sr / wall:.2f}")
    save_results(f"chunk_sweep_{size}", {str(k): v for k, v in rows.items()})


if __name__ == "__main__":
    main()
