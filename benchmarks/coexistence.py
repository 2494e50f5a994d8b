"""TTS speed while another workload shares the chip.

Counterpart of reference benchmarks/parakeet_coexistence.py:1-323 (TTS + ASR
sharing one GPU across 5 conditions). Without a second model family in this
environment, the co-tenant is a synthetic matmul service (a stand-in for an
ASR/embedding model), dispatched from a second thread onto the same chip.

Conditions:
  A: TTS alone
  B: TTS while the co-tenant dispatches continuously
  C: TTS while the co-tenant dispatches at a 10 Hz duty cycle

    MODEL_SIZE=0.6b python benchmarks/coexistence.py
"""
from __future__ import annotations

import os
import threading
import time

import numpy as np

from common import DEFAULT_TEXT, load_model, save_results, time_stream, xvec_prompt


class CoTenant:
    """Background thread dispatching matmuls on the same device."""

    def __init__(self, size=1024, duty_hz=None):
        import jax
        import jax.numpy as jnp

        self._stop = threading.Event()
        self.duty_hz = duty_hz

        @jax.jit
        def work(x):
            for _ in range(4):
                x = jnp.tanh(x @ x)
            return x

        self._work = work
        self._x = jnp.asarray(np.random.default_rng(0).standard_normal((size, size), np.float32))
        self._work(self._x).block_until_ready()  # compile
        self.dispatches = 0
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            r = self._work(self._x)
            np.asarray(r[0, 0])  # force completion
            self.dispatches += 1
            if self.duty_hz:
                time.sleep(1.0 / self.duty_hz)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._thread.join(timeout=10)


def main():
    size = os.environ.get("MODEL_SIZE", "0.6b")
    quant = os.environ.get("QUANT", "Q8_0")
    frames = int(os.environ.get("FRAMES", "96"))
    chunk = int(os.environ.get("CHUNK_SIZE", "8"))
    model = load_model(size, quant)
    prompt = xvec_prompt()

    def stream(seed):
        return model.generate_voice_clone_streaming(
            DEFAULT_TEXT, "English", voice_clone_prompt=prompt,
            max_new_tokens=frames, chunk_size=chunk, seed=seed)

    for _ in stream(0):
        pass

    results = {}
    results["A_alone"] = time_stream(model, lambda i: stream(i + 1), runs=2)
    print(f"A (alone):        TTFA {results['A_alone']['ttfa_ms']:.0f} ms  "
          f"RTF {results['A_alone']['rtf']:.2f}")
    with CoTenant() as ct:
        results["B_continuous"] = time_stream(model, lambda i: stream(i + 1), runs=2)
        results["B_continuous"]["co_tenant_dispatches"] = ct.dispatches
    print(f"B (continuous):   TTFA {results['B_continuous']['ttfa_ms']:.0f} ms  "
          f"RTF {results['B_continuous']['rtf']:.2f}")
    with CoTenant(duty_hz=10) as ct:
        results["C_10hz"] = time_stream(model, lambda i: stream(i + 1), runs=2)
        results["C_10hz"]["co_tenant_dispatches"] = ct.dispatches
    print(f"C (10Hz duty):    TTFA {results['C_10hz']['ttfa_ms']:.0f} ms  "
          f"RTF {results['C_10hz']['rtf']:.2f}")
    save_results(f"coexistence_{size}", results)


if __name__ == "__main__":
    main()
