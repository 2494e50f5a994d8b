"""On-chip A/B of the Pallas decode-attention kernel vs the XLA path.

Times the fused `decode_chunk` executable (talker 28-layer decode + predictor
15-codebook loop per frame) with the Pallas kernel forced ON (FQ3T_PALLAS=1)
and forced OFF (FQ3T_DISABLE_PALLAS=1), in separate subprocesses since the
flag is read at trace time. Records ms/frame for each and writes
bench_results_pallas_ab_<size>.json — the on-hardware evidence VERDICT r1
asked for before keeping the kernel default-on (ops/attention.py:105-128).

    python benchmarks/pallas_ab.py            # orchestrates both arms
    python benchmarks/pallas_ab.py --arm on   # one arm (internal)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import load_model, save_results, xvec_prompt


def run_arm(size: str, quant: str, chunk: int, frames: int, trials: int) -> dict:
    import numpy as np

    model = load_model(size, quant)
    prompt = xvec_prompt()
    text = "The quick brown fox jumps over the lazy dog today."

    tie, tam, tth, tpe, _rc = model._prepare_generation(
        text, "English", voice_clone_prompt=prompt, xvec_only=True
    )
    from faster_qwen3_tts_tpu.engine import generate as gen_lib
    from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

    sess = gen_lib.GenerationSession(
        model.params, model.config, tie, tam, tth, tpe,
        model.max_seq_len, SamplingParams(0.9, 50, 1.0, True, 1.05),
        gen_lib.predictor_sampling(), 2, seed=0,
    )
    sess.prefill()
    # compile + warm
    packed = sess.decode_chunk_async(chunk)
    sess.materialize(packed)

    times = []
    done_frames = 0
    for _ in range(trials):
        n = 0
        t0 = time.perf_counter()
        while n < frames:
            packed = sess.decode_chunk_async(chunk)
            f, _done = sess.materialize(packed)
            n += chunk
        times.append((time.perf_counter() - t0) / n * 1000.0)
        done_frames += n
    return {
        "ms_per_frame": round(float(np.median(times)), 3),
        "trials_ms_per_frame": [round(t, 3) for t in times],
        "frames_total": done_frames,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["on", "off"], default=None)
    ap.add_argument("--model", default=os.environ.get("MODEL_SIZE", "0.6b"))
    ap.add_argument("--quant", default=os.environ.get("QUANT", "BF16"))
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    if args.arm:
        result = run_arm(args.model, args.quant, args.chunk, args.frames, args.trials)
        print("ARM_RESULT " + json.dumps(result))
        return

    results = {"model": args.model, "quant": args.quant, "chunk": args.chunk}
    for arm, env_kv in (("pallas_on", ("FQ3T_PALLAS", "1")),
                        ("pallas_off", ("FQ3T_DISABLE_PALLAS", "1"))):
        env = dict(os.environ)
        env.pop("FQ3T_PALLAS", None)
        env.pop("FQT3_DISABLE_PALLAS", None)
        env.pop("FQ3T_DISABLE_PALLAS", None)
        env[env_kv[0]] = env_kv[1]
        print(f"=== arm {arm} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, __file__, "--arm", "on", "--model", args.model,
             "--quant", args.quant, "--chunk", str(args.chunk),
             "--frames", str(args.frames), "--trials", str(args.trials)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("ARM_RESULT ")]
        if proc.returncode != 0 or not line:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            raise SystemExit(f"arm {arm} failed rc={proc.returncode}")
        results[arm] = json.loads(line[0][len("ARM_RESULT "):])
        print(f"{arm}: {results[arm]['ms_per_frame']} ms/frame", flush=True)

    on, off = results["pallas_on"]["ms_per_frame"], results["pallas_off"]["ms_per_frame"]
    results["speedup_on_vs_off"] = round(off / on, 3) if on else None
    save_results(f"pallas_ab_{args.model}", results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
