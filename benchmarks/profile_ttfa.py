"""TTFA phase profiler: prompt assembly / prefill / first chunk / vocode.

Counterpart of reference benchmarks/profile_ggml_ttfa.py:1-306 (per-phase
native [Profile] log parsing) — here the phases are measured directly around
the engine calls, for BOTH prompt modes:

  xvec  short prompt, fused first chunk at ctx=0 (the headline TTFA path)
  icl   ~7 s of reference codec tokens in context: larger prefill bucket,
        device ref-window upload (set_codec_history), fused first chunk at
        ctx=context_frames (the round-4 fused ICL path)

The per-phase split is what explains the ICL-vs-xvec TTFA gap (bench.py
round 4: 221.7 vs 135.5 ms p50 at 1.7B): everything after prompt assembly
is ONE async dispatch chain ending in one fetch, so the breakdown separates
host prompt work, the ICL history upload, dispatch issue time, and the
blocking fetch (prefill + chunk decode + vocode execute inside it).

    MODEL_SIZE=1.7b QUANT=Q8_0 python benchmarks/profile_ttfa.py
"""
from __future__ import annotations

import os
import time

import numpy as np

from common import DEFAULT_TEXT, icl_prompt, load_model, save_results, xvec_prompt

ICL_TEXT = (
    "The quick brown fox jumps over the lazy dog today, while the "
    "calm narrator keeps a steady and friendly reading pace."
)


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    first = int(os.environ.get("FIRST_CHUNK", "4"))
    trials = int(os.environ.get("TRIALS", "5"))
    ref_frames = int(os.environ.get("REF_FRAMES", "90"))
    model = load_model(size, quant)
    xv = xvec_prompt()
    icl = icl_prompt(ref_frames=ref_frames)

    from faster_qwen3_tts_tpu.engine import generate as gen_lib
    from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

    # warm everything (compiles for both prompt modes' prefill buckets and
    # both first-chunk executables)
    for prompt, text, ref_text in (
        (xv, DEFAULT_TEXT, None),
        (icl, ICL_TEXT, "reference transcript"),
    ):
        for _ in model.generate_voice_clone_streaming(
            text, "English", voice_clone_prompt=prompt, ref_text=ref_text,
            max_new_tokens=3 * chunk, chunk_size=chunk, seed=0,
            first_chunk_size=first,
        ):
            pass

    results = {}
    for mode, prompt, text, ref_text in (
        ("xvec", xv, DEFAULT_TEXT, None),
        ("icl", icl, ICL_TEXT, "reference transcript"),
    ):
        rows = []
        for trial in range(trials):
            t0 = time.perf_counter()
            tie, tam, tth, tpe, ref_codes = model._prepare_generation(
                text=text, language="English", voice_clone_prompt=prompt,
                ref_text=ref_text, non_streaming_mode=False,
            )
            t1 = time.perf_counter()
            sess = gen_lib.GenerationSession(
                model.params, model.config, tie, tam, tth, tpe,
                model.max_seq_len, SamplingParams(), SamplingParams(), 2,
                seed=trial,
            )
            sess.hist = None
            sess.prefill(block=False)
            t2 = time.perf_counter()
            if mode == "icl":
                # engine default context_frames (fast_generate_streaming_fused)
                from faster_qwen3_tts_tpu.engine.generate import CONTEXT_FRAMES

                ctx = CONTEXT_FRAMES
                sess.set_codec_history(np.asarray(ref_codes, np.int32), ctx)
            else:
                ctx = 0
            t3 = time.perf_counter()
            flat = sess.decode_chunk_fused_async(first, ctx)
            t4 = time.perf_counter()
            audio, frames, done, emitted = sess.materialize_fused(flat, first)
            t5 = time.perf_counter()
            rows.append({
                "prompt_assembly_ms": (t1 - t0) * 1000,
                "prefill_dispatch_ms": (t2 - t1) * 1000,
                "hist_upload_ms": (t3 - t2) * 1000,
                "chunk_dispatch_ms": (t4 - t3) * 1000,
                "fetch_ms": (t5 - t4) * 1000,
                "ttfa_ms": (t5 - t0) * 1000,
                "prefill_len": int(tie.shape[1]),
            })
            r = rows[-1]
            print(
                f"{mode} trial {trial}: prompt {r['prompt_assembly_ms']:.1f} | "
                f"prefill-dispatch {r['prefill_dispatch_ms']:.1f} | "
                f"hist-upload {r['hist_upload_ms']:.1f} | "
                f"chunk-dispatch {r['chunk_dispatch_ms']:.1f} | "
                f"fetch {r['fetch_ms']:.1f} | TTFA {r['ttfa_ms']:.1f} ms "
                f"(prefill_len {r['prefill_len']})"
            )
        med = {k: round(float(np.median([r[k] for r in rows])), 2) for k in rows[0]}
        results[mode] = {"trials": rows, "median": med}
        print(f"{mode} median: {med}")

    results["config"] = {
        "model": size, "quant": quant, "chunk": chunk, "first_chunk": first,
        "ref_frames": ref_frames, "trials": trials,
    }
    save_results(f"ttfa_{size}", results)


if __name__ == "__main__":
    main()
