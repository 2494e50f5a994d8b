"""CustomVoice TTFA/RTF benchmark.

Counterpart of reference benchmarks/custom_voice.py:1-109.

    MODEL_SIZE=0.6b SPEAKER=aiden python benchmarks/custom_voice.py
"""
from __future__ import annotations

import os

from common import DEFAULT_TEXT, load_model, save_results, time_stream


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    frames = int(os.environ.get("FRAMES", "96"))
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    model = load_model(f"{size}-custom", quant)
    speaker = os.environ.get("SPEAKER") or model.get_supported_speakers()[0]
    text = os.environ.get("TEXT", DEFAULT_TEXT)

    def stream(seed):
        return model.generate_custom_voice_streaming(
            text, speaker=speaker, language="English",
            max_new_tokens=frames, chunk_size=chunk, seed=seed)

    for _ in stream(0):
        pass
    stats = time_stream(model, lambda i: stream(i + 1), runs=3)
    print(f"CustomVoice [{speaker}]: TTFA {stats['ttfa_ms']:.0f} ms  RTF {stats['rtf']:.2f}")
    save_results(f"custom_voice_{size}", {"speaker": speaker, **stats})


if __name__ == "__main__":
    main()
