"""Shared benchmark harness utilities."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DEFAULT_TEXT = (
    "The quick brown fox jumps over the lazy dog while the orchestra "
    "plays a bright morning overture across the valley."
)

MODEL_IDS = {
    "0.6b": "Qwen/Qwen3-TTS-12Hz-0.6B-Base",
    "1.7b": "Qwen/Qwen3-TTS-12Hz-1.7B-Base",
    "0.6b-custom": "Qwen/Qwen3-TTS-12Hz-0.6B-CustomVoice",
    "1.7b-custom": "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
    "1.7b-design": "Qwen/Qwen3-TTS-12Hz-1.7B-VoiceDesign",
}


def enable_compile_cache():
    """Opt-in persistent compile cache (FQ3T_JAX_CACHE=<dir>). On this
    environment's tunneled TPU the cache captures nothing and its
    serialization attempts stall compiles by minutes, so default OFF."""
    import os

    import jax

    if not os.environ.get("FQ3T_JAX_CACHE"):
        return
    jax.config.update("jax_compilation_cache_dir", os.environ["FQ3T_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def load_model(size="0.6b", quant="BF16", max_seq_len=2048):
    # Device-side random init: host init of a real-geometry model costs
    # ~16 min of single-core RNG on this machine vs ~15 s in HBM (bench.py
    # does the same; perf-identical weights).
    os.environ.setdefault("FQ3T_DEVICE_INIT", "1")
    enable_compile_cache()
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS

    return FasterQwen3TTS.from_pretrained(
        MODEL_IDS.get(size, size), quant=quant, max_seq_len=max_seq_len
    )


def xvec_prompt(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ref_spk_embedding": [rng.standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [True],
        "icl_mode": [False],
        "ref_code": [None],
    }


def icl_prompt(seed=0, ref_frames=60):
    rng = np.random.default_rng(seed)
    return {
        "ref_spk_embedding": [rng.standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [False],
        "icl_mode": [True],
        "ref_code": [rng.integers(0, 2048, (ref_frames, 16)).astype(np.int32)],
    }


def time_stream(model, gen_factory, runs=3):
    """Run a streaming generator factory `runs` times -> stats dict."""
    ttfas, rtfs, steps_ms = [], [], []
    for i in range(runs):
        t0 = time.perf_counter()
        ttfa = None
        samples = 0
        n = 0
        for audio, sr, timing in gen_factory(i):
            if ttfa is None:
                ttfa = (time.perf_counter() - t0) * 1000
            samples += len(audio)
            n = timing["total_steps_so_far"]
        wall = time.perf_counter() - t0
        ttfas.append(ttfa)
        rtfs.append(samples / sr / wall)
        steps_ms.append(wall * 1000 / max(n, 1))
    return {
        "ttfa_ms": float(np.median(ttfas)),
        "ttfa_std": float(np.std(ttfas)),
        "rtf": float(np.median(rtfs)),
        "rtf_std": float(np.std(rtfs)),
        "ms_per_step": float(np.median(steps_ms)),
        "runs": runs,
    }


def save_results(name: str, results: dict):
    import jax

    device = str(jax.devices()[0]).replace(" ", "_")
    path = Path(__file__).parent / f"bench_results_{name}_{device}.json"
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"saved {path}", file=sys.stderr)
    return path
