"""Generate seeded fast-vs-parity wav pairs for human A/B listening.

Counterpart of reference benchmarks/generate_parity_samples.py:1-97 (the
static-vs-dynamic sample pairs in samples/parity/). Greedy decoding with a
fixed seed makes the two paths token-identical; the wavs let a listener
confirm the vocoder paths match perceptually.

    python benchmarks/generate_parity_samples.py --outdir samples/parity
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from common import load_model, xvec_prompt

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from faster_qwen3_tts_tpu.utils.audio import write_wav  # noqa: E402

PROMPTS = [
    "The tide rolled in slowly, erasing every footprint on the sand.",
    "Seventeen engineers agreed that the schematic needed one more review.",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="samples/parity")
    ap.add_argument("--size", default="0.6b")
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()
    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)

    model = load_model(args.size, "BF16")
    prompt = xvec_prompt()
    for i, text in enumerate(PROMPTS):
        for parity in (False, True):
            pieces = []
            for audio, sr, _t in model.generate_voice_clone_streaming(
                text, "English", voice_clone_prompt=prompt, do_sample=False,
                max_new_tokens=args.frames, seed=1234 + i, parity_mode=parity,
            ):
                pieces.append(audio)
            wav = np.concatenate(pieces)
            name = out / f"gen{i+1}_{'parity' if parity else 'fast'}.wav"
            write_wav(name, wav, model.sample_rate)
            print(f"wrote {name} ({len(wav)/model.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
