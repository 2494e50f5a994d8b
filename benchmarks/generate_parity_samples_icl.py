"""Seeded fast-vs-parity wav pairs for ICL voice cloning.

Counterpart of reference benchmarks/generate_parity_samples_icl.py:1-167.

    python benchmarks/generate_parity_samples_icl.py --outdir samples/parity
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from common import icl_prompt, load_model

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from faster_qwen3_tts_tpu.utils.audio import write_wav  # noqa: E402

PROMPTS = [
    "A gentle rain settled over the harbor as the last ferry departed.",
    "Measure twice, cut once, and label everything before you forget.",
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
    prompt = icl_prompt(ref_frames=50)
    for i, text in enumerate(PROMPTS):
        for parity in (False, True):
            pieces = []
            for audio, sr, _t in model.generate_voice_clone_streaming(
                text, "English", ref_text="the reference transcript",
                voice_clone_prompt=prompt, do_sample=False,
                max_new_tokens=args.frames, seed=4321 + i, parity_mode=parity,
            ):
                pieces.append(audio)
            wav = np.concatenate(pieces)
            name = out / f"icl_gen{i+1}_{'parity' if parity else 'fast'}.wav"
            write_wav(name, wav, model.sample_rate)
            print(f"wrote {name} ({len(wav)/model.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
