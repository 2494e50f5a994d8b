"""TTS speed while a REAL second model shares the chip (A-E + concurrent F).

Counterpart of reference benchmarks/parakeet_coexistence.py:1-323, which
measures Qwen3-TTS while a nano-parakeet ASR model shares the GPU across
five residency conditions. The TPU-native analog uses a real second JAX
program in a SEPARATE PROCESS (VERDICT r3 next #9: not a synthetic GEMM
thread): the in-tree voice-extraction stack (ECAPA speaker encoder + codec
encoder, models/voice_extract.py) at real geometry, encoding ~8 s of audio —
the same "audio-analysis model sharing the accelerator with TTS" shape as
the reference's ASR co-tenant.

Conditions (mirroring reference parakeet_coexistence.py A-E, plus F):
  A: TTS alone (baseline)
  B: co-tenant loaded and HBM-resident in another process, idle, then TTS
  C: co-tenant ran an encode ~2 s before TTS (no offload)
  D: co-tenant offloaded to host (device buffers deleted) before TTS
  E: co-tenant encode + 2 s pause + offload, then TTS
  F: co-tenant encoding CONTINUOUSLY while TTS streams (true concurrency —
     the reference can't isolate this because its conditions are
     sequential; on this platform two processes genuinely share the chip)

    MODEL_SIZE=0.6b QUANT=Q8_0 python benchmarks/coexistence.py
CPU smoke: JAX_PLATFORMS=cpu FQ3T_COEX_TINY=1 python benchmarks/coexistence.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Co-tenant child: a real audio-encoder model with a line protocol on stdin.
#   load    -> init speaker+codec-encoder params on device, compile forwards
#   infer   -> encode ~8 s of audio (x-vector + RVQ codes), fetch results
#   offload -> device_get every param to host numpy, delete device buffers
#   reload  -> put the offloaded params back on device
#   quit    -> exit
# Replies "ok <cmd> <seconds>" after each command completes.
# ---------------------------------------------------------------------------


def cotenant_main():
    import jax

    from faster_qwen3_tts_tpu.config import get_config, tiny_test_config
    from faster_qwen3_tts_tpu.models import voice_extract as vx

    tiny = os.environ.get("FQ3T_COEX_TINY") == "1"
    cfg = tiny_test_config() if tiny else get_config("Qwen/Qwen3-TTS-12Hz-0.6B-Base")
    sr = cfg.codec.sample_rate
    audio = np.random.default_rng(0).standard_normal(int(sr * 8)).astype(np.float32) * 0.1

    state = {"extractor": None, "host_params": None}

    def do(cmd: str) -> None:
        if cmd == "load":
            # random-init at real geometry; extract_codes' RVQ nearest-
            # neighbour search also needs the codec's code_embed table.
            rng = np.random.default_rng(3)
            embed = rng.standard_normal(
                (cfg.codec.codebook_size * cfg.codec.num_quantizers, cfg.codec.hidden_size),
                dtype=np.float32) * 0.02
            ex = vx.VoiceExtractor({"codec": {"code_embed": embed}}, cfg)
            # init_* return host numpy; the residency conditions need the
            # model to actually LIVE in HBM like the reference's GPU-resident
            # parakeet, so move the whole tree to the device.
            ex.params = jax.device_put(ex.params)
            jax.block_until_ready(jax.tree.leaves(ex.params)[0])
            state["extractor"] = ex
            ex.extract_xvector(audio, sr)  # compile both forwards now
            ex.extract_codes(audio, sr)
        elif cmd == "infer":
            ex = state["extractor"]
            xv = ex.extract_xvector(audio, sr)
            codes = ex.extract_codes(audio, sr)
            assert np.asarray(xv).size and np.asarray(codes).size
        elif cmd == "offload":
            ex = state["extractor"]
            state["host_params"] = jax.device_get(ex.params)
            ex.params = None  # drop the only reference -> HBM buffers freed
        elif cmd == "reload":
            ex = state["extractor"]
            ex.params = jax.device_put(state["host_params"])
            jax.block_until_ready(jax.tree.leaves(ex.params)[0])
        else:
            raise ValueError(cmd)

    for line in sys.stdin:
        cmd = line.strip()
        if not cmd:
            continue
        if cmd == "quit":
            break
        t0 = time.perf_counter()
        do(cmd)
        print(f"ok {cmd} {time.perf_counter() - t0:.2f}", flush=True)


class CoTenantProcess:
    """Drives the co-tenant child over stdin/stdout."""

    def __init__(self):
        env = dict(os.environ)
        root = str(Path(__file__).resolve().parent.parent)
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--cotenant"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, env=env, cwd=root,
        )
        self._lock = threading.Lock()

    def cmd(self, name: str, timeout_s: float = 900.0) -> float:
        with self._lock:
            self.proc.stdin.write(name + "\n")
            self.proc.stdin.flush()
            line = self.proc.stdout.readline()
        if not line.startswith(f"ok {name}"):
            raise RuntimeError(f"co-tenant failed on {name!r}: {line!r}")
        secs = float(line.split()[-1])
        log(f"  co-tenant {name}: {secs:.2f}s")
        return secs

    def close(self):
        try:
            if self.proc.poll() is None:
                self.proc.stdin.write("quit\n")
                self.proc.stdin.flush()
                self.proc.wait(timeout=30)
        except Exception:
            self.proc.kill()


class ContinuousInfer:
    """Condition F: keep the co-tenant encoding in a background thread."""

    def __init__(self, ct: CoTenantProcess):
        self.ct = ct
        self._stop = threading.Event()
        self.n = 0
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.ct.cmd("infer")
            self.n += 1

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._thread.join(timeout=120)


def main():
    from common import DEFAULT_TEXT, load_model, save_results, time_stream, xvec_prompt

    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    frames = int(os.environ.get("FRAMES", "96"))
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    runs = int(os.environ.get("RUNS", "3"))
    tiny = os.environ.get("FQ3T_COEX_TINY") == "1"

    if tiny:
        import jax.numpy as jnp

        from faster_qwen3_tts_tpu import weights as weights_lib
        from faster_qwen3_tts_tpu.config import tiny_test_config
        from faster_qwen3_tts_tpu.model import FasterQwen3TTS
        from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer

        cfg = tiny_test_config()
        params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
        model = FasterQwen3TTS(params, cfg, PromptTokenizer(ByteTokenizer()), max_seq_len=256)
        frames = min(frames, 16)
        runs = 1
    else:
        model = load_model(size, quant)
    prompt = xvec_prompt()
    text = DEFAULT_TEXT

    def stream(seed):
        return model.generate_voice_clone_streaming(
            text, "English", voice_clone_prompt=prompt,
            max_new_tokens=frames, chunk_size=chunk, seed=seed)

    for _ in stream(0):  # compile warmup
        pass

    results = {}

    def run(label, pretty):
        r = time_stream(model, lambda i: stream(i + 1), runs=runs)
        results[label] = r
        base = results.get("A_alone", r)
        log(f"{pretty:<44} ms/step {r['ms_per_step']:7.2f}  RTF {r['rtf']:5.2f}  "
            f"TTFA {r['ttfa_ms']:6.0f} ms  ({r['rtf'] / base['rtf']:.2f}x baseline RTF)")
        return r

    # A: alone
    run("A_alone", "A: TTS alone")

    ct = CoTenantProcess()
    try:
        results["cotenant_load_s"] = ct.cmd("load")

        # B: resident + idle
        run("B_resident_idle", "B: co-tenant resident (other process), idle")

        # C: inferred ~2 s before TTS
        ct.cmd("infer")
        time.sleep(2.0)
        run("C_infer_2s_before", "C: co-tenant encode 2s before TTS")

        # D: offloaded to host
        ct.cmd("offload")
        run("D_offloaded", "D: co-tenant offloaded to host")

        # E: infer + 2 s + offload
        ct.cmd("reload")
        ct.cmd("infer")
        time.sleep(2.0)
        ct.cmd("offload")
        run("E_infer_pause_offload", "E: encode + 2s pause + offload, then TTS")

        # F: continuously encoding DURING TTS (concurrent processes)
        ct.cmd("reload")
        with ContinuousInfer(ct) as ci:
            run("F_concurrent", "F: co-tenant encoding continuously during TTS")
            results["F_concurrent"]["co_tenant_encodes"] = ci.n
    finally:
        ct.close()

    base = results["A_alone"]["rtf"]
    for k in ("B_resident_idle", "C_infer_2s_before", "D_offloaded",
              "E_infer_pause_offload", "F_concurrent"):
        results[k]["rtf_vs_alone"] = round(results[k]["rtf"] / base, 3)

    save_results(f"coexistence_{size}", results)
    print(json.dumps({k: v for k, v in results.items()}, default=float))


if __name__ == "__main__":
    if "--cotenant" in sys.argv:
        cotenant_main()
    else:
        main()
