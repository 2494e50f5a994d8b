"""Streaming timeline benchmark: per-chunk timing + TTFA.

Counterpart of reference benchmarks/streaming.py:1-151 (per-chunk timeline,
PARITY_STREAMING env toggle).

    MODEL_SIZE=0.6b CHUNK_SIZE=8 python benchmarks/streaming.py
    PARITY_STREAMING=1 python benchmarks/streaming.py
"""
from __future__ import annotations

import os
import time

from common import DEFAULT_TEXT, load_model, save_results, xvec_prompt


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    frames = int(os.environ.get("FRAMES", "96"))
    parity = bool(int(os.environ.get("PARITY_STREAMING", "0")))
    text = os.environ.get("TEXT", DEFAULT_TEXT)
    model = load_model(size, quant)
    prompt = xvec_prompt()

    def stream(seed):
        return model.generate_voice_clone_streaming(
            text, "English", voice_clone_prompt=prompt, max_new_tokens=frames,
            chunk_size=chunk, seed=seed, parity_mode=parity,
        )

    for _ in stream(0):  # warmup
        pass

    t0 = time.perf_counter()
    timeline = []
    for audio, sr, timing in stream(1):
        t = time.perf_counter() - t0
        timeline.append(
            {
                "chunk": timing["chunk_index"],
                "wall_s": round(t, 3),
                "decode_ms": round(timing["decode_ms"], 1),
                "audio_ms": round(len(audio) / sr * 1000, 1),
                "steps": timing["total_steps_so_far"],
            }
        )
        print(
            f"chunk {timing['chunk_index']:3d} @ {t:6.3f}s  decode {timing['decode_ms']:6.1f} ms  "
            f"audio {len(audio)/sr*1000:6.1f} ms"
        )
    ttfa = timeline[0]["wall_s"] * 1000 if timeline else None
    total_audio = sum(r["audio_ms"] for r in timeline) / 1000
    wall = timeline[-1]["wall_s"] if timeline else 1
    print(f"TTFA {ttfa:.0f} ms | RTF {total_audio/wall:.2f} | parity={parity}")
    save_results(
        f"streaming_{size}{'_parity' if parity else ''}",
        {"ttfa_ms": ttfa, "rtf": total_audio / wall, "timeline": timeline},
    )


if __name__ == "__main__":
    main()
