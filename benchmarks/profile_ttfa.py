"""TTFA phase profiler: prompt assembly / prefill / first chunk / vocode.

Counterpart of reference benchmarks/profile_ggml_ttfa.py:1-306 (per-phase
native [Profile] log parsing) — here the phases are measured directly around
the engine calls.

    python benchmarks/profile_ttfa.py
"""
from __future__ import annotations

import os
import time

import numpy as np

from common import DEFAULT_TEXT, load_model, save_results, xvec_prompt


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    trials = int(os.environ.get("TRIALS", "3"))
    model = load_model(size, quant)
    prompt = xvec_prompt()

    # warm everything
    for _ in model.generate_voice_clone_streaming(
        DEFAULT_TEXT, "English", voice_clone_prompt=prompt,
        max_new_tokens=3 * chunk, chunk_size=chunk, seed=0,
    ):
        pass

    from faster_qwen3_tts_tpu.engine import generate as gen_lib
    from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

    rows = []
    for trial in range(trials):
        t0 = time.perf_counter()
        tie, tam, tth, tpe, _rc = model._prepare_generation(
            text=DEFAULT_TEXT, language="English", voice_clone_prompt=prompt,
            non_streaming_mode=False,
        )
        t1 = time.perf_counter()
        sess = gen_lib.GenerationSession(
            model.params, model.config, tie, tam, tth, tpe,
            model.max_seq_len, SamplingParams(), SamplingParams(), 2, seed=trial,
        )
        sess.hist = None
        sess.prefill(block=False)
        flat = sess.decode_chunk_fused_async(chunk, 0)
        audio, frames, done, emitted = sess.materialize_fused(flat, chunk)
        t2 = time.perf_counter()
        rows.append(
            {
                "prompt_assembly_ms": (t1 - t0) * 1000,
                "prefill_chunk_vocode_ms": (t2 - t1) * 1000,
                "ttfa_ms": (t2 - t0) * 1000,
            }
        )
        print(
            f"trial {trial}: prompt {rows[-1]['prompt_assembly_ms']:.0f} ms | "
            f"prefill+chunk+vocode {rows[-1]['prefill_chunk_vocode_ms']:.0f} ms | "
            f"TTFA {rows[-1]['ttfa_ms']:.0f} ms"
        )

    med = {k: float(np.median([r[k] for r in rows])) for k in rows[0]}
    save_results(f"ttfa_{size}", {"trials": rows, "median": med})


if __name__ == "__main__":
    main()
