"""Baseline measurement: the unfused/parity engine path.

Counterpart of reference benchmarks/baseline.py:1-81 (stock upstream model
speed). Here the "baseline" is this framework's own parity path — separate
per-chunk executables, host-side vocoding, no dispatch-ahead — i.e. the
engine without its fast-path machinery, the closest analog of running the
stock dynamic-cache model.

    MODEL_SIZE=0.6b python benchmarks/baseline.py
"""
from __future__ import annotations

import os

from common import DEFAULT_TEXT, load_model, save_results, time_stream, xvec_prompt


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    frames = int(os.environ.get("FRAMES", "96"))
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    model = load_model(size, "BF16")
    prompt = xvec_prompt()

    def stream(seed):
        return model.generate_voice_clone_streaming(
            DEFAULT_TEXT, "English", voice_clone_prompt=prompt,
            max_new_tokens=frames, chunk_size=chunk, seed=seed, parity_mode=True,
        )

    for _ in stream(0):
        pass
    stats = time_stream(model, lambda i: stream(i + 1), runs=3)
    print(f"baseline (parity path, BF16): TTFA {stats['ttfa_ms']:.0f} ms  RTF {stats['rtf']:.2f}")
    save_results(f"baseline_{size}", stats)


if __name__ == "__main__":
    main()
