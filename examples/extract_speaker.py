"""Extract a reusable x-vector speaker embedding from reference audio.

Counterpart of reference examples/extract_speaker.py:1-45 (ref wav -> 4 KB
speaker file). Saves float32 .npy instead of torch .pt (torch-free stack).

    python examples/extract_speaker.py ref.wav speaker.npy
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from faster_qwen3_tts_tpu.model import FasterQwen3TTS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_audio")
    ap.add_argument("out", nargs="?", default="speaker.npy")
    ap.add_argument("--model", default="Qwen/Qwen3-TTS-12Hz-0.6B-Base")
    args = ap.parse_args()

    model = FasterQwen3TTS.from_pretrained(args.model)
    items = model.create_voice_clone_prompt(args.ref_audio, x_vector_only_mode=True)
    xvec = np.asarray(items[0].ref_spk_embedding, np.float32)
    np.save(args.out, xvec)
    print(f"wrote {args.out}: {xvec.shape[0]}-d x-vector ({xvec.nbytes} bytes)")


if __name__ == "__main__":
    main()
