"""Generate speech from a precomputed x-vector (no codec encoder needed).

Counterpart of reference examples/generate_with_embedding.py:1-113 — the
fastest voice-clone path: a saved speaker embedding skips all reference-audio
processing at request time.

    python examples/generate_with_embedding.py speaker.npy "Hello" -o out.wav
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from faster_qwen3_tts_tpu.model import FasterQwen3TTS
from faster_qwen3_tts_tpu.utils.audio import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("speaker_file")
    ap.add_argument("text")
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("--model", default="Qwen/Qwen3-TTS-12Hz-0.6B-Base")
    ap.add_argument("--language", default="English")
    ap.add_argument("--quant", default="BF16")
    args = ap.parse_args()

    xvec = np.load(args.speaker_file)
    prompt = {
        "ref_spk_embedding": [xvec],
        "x_vector_only_mode": [True],
        "icl_mode": [False],
        "ref_code": [None],
    }
    model = FasterQwen3TTS.from_pretrained(args.model, quant=args.quant)
    t0 = time.perf_counter()
    audio, sr = model.generate_voice_clone(
        args.text, args.language, voice_clone_prompt=prompt
    )
    wall = time.perf_counter() - t0
    write_wav(args.output, audio[0], sr)
    print(f"wrote {args.output}: {len(audio[0])/sr:.2f}s in {wall:.2f}s "
          f"(RTF {(len(audio[0])/sr)/wall:.2f})")


if __name__ == "__main__":
    main()
