#!/usr/bin/env python3
"""Q8_0-vs-BF16 end-to-end waveform delta at REAL model geometry (VERDICT r4
next #9).

No trained checkpoint ships in this environment, so perceptual quality is
unmeasurable — but the NUMERIC damage of int8 weight-only quantization is
measurable end to end: device-init the same seed-0 real-geometry weights
twice (quantization happens after init, model.py, so both pipelines share
the exact same underlying BF16 values), run the identical greedy request
through the full talker -> predictor -> codec pipeline both ways, and report

  - frame-token agreement fraction + first diverging frame (AR divergence),
  - waveform SNR / cosine over the common-token prefix (pure quant noise,
    before AR divergence compounds it) and over the full clip.

The same formulas are pinned by tests/test_quant.py::
test_q8_waveform_delta_end_to_end at tiny geometry; this harness records the
real-geometry floor in bench_results_quant_delta_* for BENCH_NOTES.md.

Usage (real chip): python benchmarks/quant_delta.py --model 0.6b --frames 96
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from common import load_model, save_results, xvec_prompt

TEXT = "The quick brown fox jumps over the lazy dog today."


def run_one(size: str, quant: str, frames: int, chunk: int):
    """-> (codes [n,16] int32, audio float32). Fresh model, greedy, seed 0."""
    t0 = time.perf_counter()
    model = load_model(size, quant=quant)
    model._warmed_up = True  # compile lazily: only the executables this uses
    prompt = xvec_prompt(0)
    chunks = []
    for audio, _sr, _t in model.generate_voice_clone_streaming(
        TEXT, "English", voice_clone_prompt=prompt, max_new_tokens=frames,
        chunk_size=chunk, do_sample=False, seed=0, subtalker_dosample=False,
    ):
        chunks.append(audio)
    wav = np.concatenate(chunks)

    # Greedy frame tokens via the non-streaming engine (same decode graph).
    from faster_qwen3_tts_tpu.engine import aot, core
    from faster_qwen3_tts_tpu.engine import generate as gen_lib
    from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

    tie, tam, tth, tpe, _ = model._prepare_generation(
        text=TEXT, language="English", ref_audio=None, ref_text="",
        xvec_only=True, non_streaming_mode=False, append_silence=True,
        voice_clone_prompt=prompt, instruct=None,
    )
    codes, _t = gen_lib.fast_generate(
        model.params, model.config, tie, tam, tth, tpe,
        max_seq_len=model.max_seq_len, max_new_tokens=frames,
        do_sample=False, subtalker_dosample=False, seed=0,
    )

    # Prefill logits under the IDENTICAL context: the conditional
    # next-frame distribution both arms see before any AR divergence —
    # the metric that actually isolates quant noise (see main()).
    sess = gen_lib.GenerationSession(
        model.params, model.config, tie, tam, tth, tpe, model.max_seq_len,
        SamplingParams(0.9, 50, 1.0, False, 1.05),
        gen_lib.predictor_sampling(False, None, None, None), 2,
        seed=0, dtype=model.dtype,
    )
    _state, logits = aot.call(
        "start_state", core.start_state,
        talker_params=model.params["talker"], talker_cfg=model.config.talker,
        embeds=sess.tie, pad_mask=sess.mask, key=sess.key,
        max_seq=model.max_seq_len, sampling=sess.sampling,
        min_new_tokens=sess.min_new_tokens,
    )
    logits = np.asarray(logits, np.float64)[0]
    print(f"[{quant}] {len(codes)} frames, {wav.size} samples "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)
    return np.asarray(codes), np.asarray(wav, np.float64), logits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="0.6b", choices=["0.6b", "1.7b"])
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()

    fa, a, la = run_one(args.model, "BF16", args.frames, args.chunk)
    fq, b, lq = run_one(args.model, "Q8_0", args.frames, args.chunk)

    n = min(len(fa), len(fq))
    agree = np.all(fa[:n] == fq[:n], axis=1)
    first_div = int(np.argmin(agree)) if not agree.all() else n

    def metrics(x, y):
        m = min(len(x), len(y))
        if m == 0:
            return {"cosine": None, "snr_db": None, "samples": 0}
        x, y = x[:m], y[:m]
        cos = float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12))
        snr = 10 * np.log10(float(np.sum(x**2) / (np.sum((x - y) ** 2) + 1e-12)))
        return {"cosine": round(cos, 6), "snr_db": round(snr, 2), "samples": m}

    # Conditional (identical-context) metrics: the quant-noise floor. The
    # free-running waveform rows below measure AR DIVERGENCE, not quality:
    # random-init logits are near-uniform, so any perturbation flips the
    # frame-0 argmax and the two decodes tell different (equally random)
    # utterances from there. A trained checkpoint has peaked logits, where
    # the conditional metrics are the ones that transfer.
    def softmax(z):
        z = z - z.max()
        e = np.exp(z)
        return e / e.sum()
    pa, pq = softmax(la), softmax(lq)
    k = 8
    ta, tq = set(np.argsort(la)[-k:]), set(np.argsort(lq)[-k:])
    cond = {
        "prefill_logit_cosine": round(float(
            la @ lq / (np.linalg.norm(la) * np.linalg.norm(lq) + 1e-12)), 6),
        "prefill_top1_equal": bool(int(la.argmax()) == int(lq.argmax())),
        f"prefill_top{k}_overlap": len(ta & tq) / k,
        "prefill_max_abs_prob_delta": round(float(np.abs(pa - pq).max()), 6),
    }

    up = len(a) // max(len(fa), 1)  # samples per frame
    pref = first_div * up
    out = {
        "model": args.model,
        "frames_bf16": int(len(fa)),
        "frames_q8": int(len(fq)),
        "conditional": cond,
        "token_agreement_fraction": round(float(agree.mean()), 4),
        "first_diverging_frame": first_div,
        "prefix": metrics(a[:pref], b[:pref]),
        "full_free_running": metrics(a, b),
    }
    print(out, flush=True)
    save_results(f"quant_delta_{args.model}", out)


if __name__ == "__main__":
    main()
