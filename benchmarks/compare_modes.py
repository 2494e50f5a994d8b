"""Mode comparison: x-vector clone vs ICL clone vs CustomVoice speed.

Counterpart of reference benchmarks/compare_modes.py:1-125 (README mode
table: ~equal TTFA/RTF across modes is the expected result).

    python benchmarks/compare_modes.py
"""
from __future__ import annotations

import os

from common import DEFAULT_TEXT, icl_prompt, load_model, save_results, time_stream, xvec_prompt


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    frames = int(os.environ.get("FRAMES", "96"))
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    runs = int(os.environ.get("RUNS", "3"))

    base = load_model(size, quant)
    xv, icl = xvec_prompt(), icl_prompt()
    results = {}

    def xvec_stream(seed):
        return base.generate_voice_clone_streaming(
            DEFAULT_TEXT, "English", voice_clone_prompt=xv,
            max_new_tokens=frames, chunk_size=chunk, seed=seed)

    def icl_stream(seed):
        return base.generate_voice_clone_streaming(
            DEFAULT_TEXT, "English", ref_text="a reference transcript",
            voice_clone_prompt=icl, max_new_tokens=frames, chunk_size=chunk, seed=seed)

    for name, fn in (("xvec", xvec_stream), ("icl", icl_stream)):
        for _ in fn(0):
            pass
        stats = time_stream(base, lambda i, fn=fn: fn(i + 1), runs=runs)
        results[name] = stats
        print(f"{name:12s}: TTFA {stats['ttfa_ms']:.0f}±{stats['ttfa_std']:.0f} ms  "
              f"RTF {stats['rtf']:.3f}±{stats['rtf_std']:.3f}  {stats['ms_per_step']:.1f} ms/step")

    custom = load_model(f"{size}-custom", quant)
    speaker = custom.get_supported_speakers()[0]

    def custom_stream(seed):
        return custom.generate_custom_voice_streaming(
            DEFAULT_TEXT, speaker=speaker, language="English",
            max_new_tokens=frames, chunk_size=chunk, seed=seed)

    for _ in custom_stream(0):
        pass
    stats = time_stream(custom, lambda i: custom_stream(i + 1), runs=runs)
    results["custom_voice"] = stats
    print(f"custom_voice: TTFA {stats['ttfa_ms']:.0f}±{stats['ttfa_std']:.0f} ms  "
          f"RTF {stats['rtf']:.3f}±{stats['rtf_std']:.3f}  {stats['ms_per_step']:.1f} ms/step")
    save_results(f"modes_{size}", results)


if __name__ == "__main__":
    main()
