"""Stream TTS to the speakers (or a wav file when headless).

Counterpart of reference examples/streaming_playback.py:1-74.

    python examples/streaming_playback.py "Hello there" --ref-audio ref.wav \
        --ref-text "..." [--xvec-only] [--out out.wav]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio import HAS_AUDIO, StreamPlayer  # noqa: E402

from faster_qwen3_tts_tpu.model import FasterQwen3TTS  # noqa: E402
from faster_qwen3_tts_tpu.utils.audio import write_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("text")
    ap.add_argument("--model", default="Qwen/Qwen3-TTS-12Hz-0.6B-Base")
    ap.add_argument("--ref-audio", required=True)
    ap.add_argument("--ref-text", default="")
    ap.add_argument("--xvec-only", action="store_true")
    ap.add_argument("--language", default="English")
    ap.add_argument("--chunk-size", type=int, default=8)
    ap.add_argument("--quant", default="BF16")
    ap.add_argument("--out", default="streamed.wav")
    args = ap.parse_args()

    model = FasterQwen3TTS.from_pretrained(args.model, quant=args.quant)
    player = StreamPlayer(sample_rate=model.sample_rate)
    player.start()

    t0 = time.perf_counter()
    ttfa = None
    for audio, sr, timing in model.generate_voice_clone_streaming(
        args.text,
        args.language,
        ref_audio=args.ref_audio,
        ref_text=args.ref_text,
        xvec_only=args.xvec_only,
        chunk_size=args.chunk_size,
    ):
        if ttfa is None:
            ttfa = (time.perf_counter() - t0) * 1000
            print(f"TTFA {ttfa:.0f} ms")
        player.push(audio)
    player.drain()
    if not HAS_AUDIO:
        wav = player.collected()
        write_wav(args.out, wav, model.sample_rate)
        print(f"(headless) wrote {args.out}: {len(wav)/model.sample_rate:.2f}s")


if __name__ == "__main__":
    main()
