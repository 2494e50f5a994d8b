"""Seeded nsm=True vs nsm=False wav pairs for human A/B.

Counterpart of reference benchmarks/generate_non_streaming_samples.py:1-100
(the samples/non_streaming_mode/ pairs): the two text-feeding layouts should
produce equivalent-quality speech.

    NSM_SAMPLES_DIR=samples/non_streaming_mode python benchmarks/generate_non_streaming_samples.py
"""
from __future__ import annotations

import os
from pathlib import Path

from common import load_model, xvec_prompt

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from faster_qwen3_tts_tpu.utils.audio import write_wav  # noqa: E402

PROMPTS = [
    "The committee reviewed both proposals before adjourning for lunch.",
]


def main():
    outdir = Path(os.environ.get("NSM_SAMPLES_DIR", "samples/non_streaming_mode"))
    outdir.mkdir(parents=True, exist_ok=True)
    size = os.environ.get("MODEL_SIZE", "0.6b")
    frames = int(os.environ.get("FRAMES", "120"))
    model = load_model(size, "BF16")
    prompt = xvec_prompt()
    for i, text in enumerate(PROMPTS):
        for nsm in (False, True):
            audio, sr = model.generate_voice_clone(
                text, "English", voice_clone_prompt=prompt, do_sample=False,
                non_streaming_mode=nsm, max_new_tokens=frames, seed=777 + i,
            )
            name = outdir / f"gen{i+1}_nsm_{'true' if nsm else 'false'}.wav"
            write_wav(name, audio[0], sr)
            print(f"wrote {name} ({len(audio[0])/sr:.2f}s)")


if __name__ == "__main__":
    main()
