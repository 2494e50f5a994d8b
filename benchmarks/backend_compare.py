"""Backend/precision comparison on a shared workload: BF16 vs Q8_0.

Counterpart of reference benchmarks/backend_compare.py:1-295 (torch vs GGML
shared-workload ms/frame table) — here the two "backends" are the XLA engine
at full bf16 precision and at int8 weight quantization.

    python benchmarks/backend_compare.py
"""
from __future__ import annotations

import os

from common import DEFAULT_TEXT, load_model, save_results, time_stream, xvec_prompt


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    frames = int(os.environ.get("FRAMES", "96"))
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    results = {}
    prompt = xvec_prompt()
    for quant in ("BF16", "Q8_0"):
        model = load_model(size, quant)

        def stream(seed):
            return model.generate_voice_clone_streaming(
                DEFAULT_TEXT, "English", voice_clone_prompt=prompt,
                max_new_tokens=frames, chunk_size=chunk, seed=seed)

        for _ in stream(0):
            pass
        stats = time_stream(model, lambda i: stream(i + 1), runs=3)
        ms_per_frame = 1000.0 / model.config.frame_rate / max(stats["rtf"], 1e-9)
        stats["ms_per_frame"] = round(ms_per_frame, 2)
        results[quant] = stats
        print(f"{quant}: TTFA {stats['ttfa_ms']:.0f} ms  RTF {stats['rtf']:.2f}  "
              f"{ms_per_frame:.1f} ms/frame")
        del model
    save_results(f"backends_{size}", results)


if __name__ == "__main__":
    main()
