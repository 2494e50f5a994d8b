#!/usr/bin/env python3
"""Batched-serving throughput: frames/s/stream and aggregate frames/s vs B.

The reference serves one request at a time behind a mutex (SURVEY §2.3,
reference openai_server.py:71); this engine keeps a leading batch dim so one
chip decodes B independent streams in lockstep. This harness measures how
much aggregate throughput that buys (AR decode is HBM-bandwidth-bound, so
batching amortizes the weight streaming almost for free until the MXU or
VMEM saturates).

Usage: python benchmarks/multistream.py [--model 0.6b] [--batches 1,2,4,8]
Writes bench_results_multistream.json next to this file.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="0.6b", choices=["0.6b", "1.7b"])
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=8, help="timed chunks per batch size")
    ap.add_argument("--quant", default="Q8_0")
    ap.add_argument("--prefill", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from common import enable_compile_cache

    enable_compile_cache()  # opt-in via FQ3T_JAX_CACHE

    from faster_qwen3_tts_tpu import weights as weights_lib
    from faster_qwen3_tts_tpu.config import get_config
    from faster_qwen3_tts_tpu.engine import core
    from faster_qwen3_tts_tpu.ops import quant as quant_lib
    from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

    name = {"0.6b": "Qwen/Qwen3-TTS-12Hz-0.6B-Base",
            "1.7b": "Qwen/Qwen3-TTS-12Hz-1.7B-Base"}[args.model]
    cfg = get_config(name)
    print(f"backend={jax.default_backend()} model={args.model} quant={args.quant}",
          file=sys.stderr)
    # device-side init + in-HBM quantization: seconds instead of ~10 min of
    # host RNG + transfer through a tunneled chip
    params = weights_lib.init_all_device(cfg, seed=0, dtype=jnp.bfloat16)
    params = {"talker": params["talker"], "predictor": params["predictor"]}
    mode = quant_lib.resolve_quant_name(args.quant)
    if mode != "none":
        params = quant_lib.quantize_model_params(params, mode)
    import os as _os

    if _os.environ.get("FQ3T_FUSE_QKV", "0") == "1":
        params = quant_lib.fuse_layer_weights(params)

    H = cfg.talker.hidden_size
    sampling = SamplingParams()
    max_seq = 1024
    rows = []
    rng = np.random.default_rng(0)

    for B in [int(b) for b in args.batches.split(",")]:
        tie = jnp.asarray(
            rng.standard_normal((B, args.prefill, H)).astype(np.float32) * 0.02,
            jnp.bfloat16,
        )
        mask = jnp.ones((B, args.prefill), jnp.int32)
        tth = jnp.zeros((B, 16, H), jnp.bfloat16)
        tpe = jnp.zeros((B, 1, H), jnp.bfloat16)
        state, _ = core.start_state(
            params["talker"], cfg.talker, tie, mask, jax.random.PRNGKey(0),
            max_seq, sampling, 2,
        )

        def chunk(state):
            return core.decode_chunk(
                params["talker"], params["predictor"], cfg.talker, cfg.predictor,
                state, tth, tpe, args.chunk, sampling, sampling, 2,
            )

        # warm (compile) then time
        state, packed = chunk(state)
        np.asarray(packed)
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            state, packed = chunk(state)
        np.asarray(packed)  # block (tunnel-honest sync)
        dt = time.perf_counter() - t0
        frames = args.chunks * args.chunk
        per_stream = frames / dt
        agg = per_stream * B
        rows.append({
            "batch": B,
            "ms_per_chunk": round(dt / args.chunks * 1000, 2),
            "frames_per_s_per_stream": round(per_stream, 1),
            "frames_per_s_aggregate": round(agg, 1),
            "rtf_per_stream_12hz": round(per_stream / 12.0, 2),
        })
        print(f"B={B}: {rows[-1]}", file=sys.stderr)

    out = {
        "model": args.model,
        "quant": args.quant,
        "chunk": args.chunk,
        "backend": __import__("jax").default_backend(),
        "rows": rows,
    }
    path = Path(__file__).parent / "bench_results_multistream.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
