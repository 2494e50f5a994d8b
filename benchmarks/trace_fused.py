"""Capture a jax.profiler trace of production fused decode+vocode chunks.

The deeper-observability layer beyond the timing dicts (SURVEY §5): a real
XLA/TPU timeline of the hot executable, viewable with TensorBoard's profile
plugin or Perfetto off-box. The trace covers steady-state chunks only (the
first dispatch warms every executable before capture starts).

    MODEL_SIZE=0.6b QUANT=Q8_0 TRACE_DIR=/tmp/fq3t_trace python benchmarks/trace_fused.py

Prints one JSON line: trace dir, chunks captured, steady-state ms/frame
measured inside the capture window (so the note in BENCH_NOTES can tie the
trace file to a number).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import load_model, xvec_prompt


def main():
    import jax

    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    n_chunks = int(os.environ.get("TRACE_CHUNKS", "4"))
    logdir = os.environ.get("TRACE_DIR", "/tmp/fq3t_trace")

    model = load_model(size, quant)
    prompt = xvec_prompt()
    text = "The quick brown fox jumps over the lazy dog today."

    def stream(n):
        """Drive n steady-state chunks through the public streaming API."""
        got = 0
        for _audio, _sr, timing in model.generate_voice_clone_streaming(
            text, "English", voice_clone_prompt=prompt,
            max_new_tokens=n * chunk + 4, chunk_size=chunk, do_sample=True, seed=0,
        ):
            got += timing.get("chunk_steps", chunk)
        return got

    # Warm pass: compiles prefill + fused executables outside the capture.
    print(f"warm pass ({chunk}-frame chunks)...", file=sys.stderr, flush=True)
    stream(n_chunks)

    print(f"tracing {n_chunks} chunks -> {logdir}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        frames = stream(n_chunks)
    wall = time.perf_counter() - t0

    # The capture writes plugins/profile/<run>/<host>.xplane.pb under logdir.
    produced = sorted(
        str(p.relative_to(logdir))
        for p in Path(logdir).rglob("*")
        if p.is_file()
    )
    print(json.dumps({
        "metric": "trace_fused_ms_per_frame",
        "value": round(wall / max(frames, 1) * 1000.0, 2),
        "unit": "ms",
        "extras": {
            "trace_dir": logdir,
            "trace_files": produced[:8],
            "chunks": n_chunks,
            "frames": frames,
            "model_size": size,
            "quant": quant,
            "chunk_size": chunk,
        },
    }), flush=True)


if __name__ == "__main__":
    main()
