"""Pallas HBM-streaming probe: can a hand kernel beat XLA's sustained rate?

Honest re-measurement (matvec_bw.py, real-fetch-bounded) shows the XLA
decode layer chain sustains only ~148 GB/s (0.6B) / ~237 GB/s (1.7B Q8_0)
of the chip's ~819 GB/s HBM peak — the talker decode step, the dominant
term of the AR frame, runs at ~30% of roofline. Before building (another)
fused decode kernel, this probe answers ONE question with a minimal kernel:
what weight-streaming rate does Mosaic's double-buffered grid pipeline
actually sustain on this chip for the decode access pattern (int8 stacked
layer weights -> VMEM -> one matvec each)?

Kernel: grid (L, I/BI); per step DMAs a [BI, O] int8 block of layer l and
accumulates x-slice @ block into a resident [1, O] f32 output. This is the
exact byte traffic of a stacked-layer matvec chain; compute is negligible.
The result bounds what a real fused decode-step kernel could achieve.

    python benchmarks/pallas_bw_probe.py             # 1.7B gate/up geometry
    L=28 I=1024 O=6144 python benchmarks/pallas_bw_probe.py   # 0.6B-ish

Prints one JSON line {pallas_ms, pallas_gb_s, xla_ms, xla_gb_s} for the
same traffic, same feedback-chained real-fetch timing.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _timeit(fn, n=20, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])  # real fetch: drains the pipeline
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = int(os.environ.get("L", "28"))
    I = int(os.environ.get("I", "2048"))
    O = int(os.environ.get("O", "12288"))
    BI = int(os.environ.get("BI", "512"))
    n = int(os.environ.get("N", "20"))
    assert I % BI == 0 and BI % 32 == 0 and O % 128 == 0

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 127, (L, I, O), dtype=np.int8))
    x0 = jnp.asarray(rng.standard_normal((1, I)) * 0.1, jnp.bfloat16)
    total_bytes = L * I * O  # int8

    # --- Pallas: grid (L, I/BI); [BI, O] int8 weight block per step,
    # accumulated into a VMEM-resident [1, O] f32 output. Mosaic's grid
    # pipeline double-buffers the weight DMA automatically.
    def kern(x_ref, w_ref, o_ref):
        li = pl.program_id(0)
        ii = pl.program_id(1)

        @pl.when(jnp.logical_and(li == 0, ii == 0))
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        wb = w_ref[0].astype(jnp.bfloat16)  # [BI, O]
        o_ref[...] += jax.lax.dot_general(
            x_ref[...], wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    stream = pl.pallas_call(
        kern,
        grid=(L, I // BI),
        in_specs=[
            pl.BlockSpec((1, BI), lambda l, i: (0, i)),
            pl.BlockSpec((1, BI, O), lambda l, i: (l, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, O), lambda l, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )

    @jax.jit
    def pallas_step(x, w):
        y = stream(x, w)
        # feed a slice back so successive dispatches have distinct args
        return (y[:, :I] * 1e-3).astype(jnp.bfloat16)

    carry = {"x": x0}

    def run_pallas():
        carry["x"] = pallas_step(carry["x"], w)
        return carry["x"]

    pallas_ms = _timeit(run_pallas, n=n)

    # --- XLA reference: same traffic as one fused program (scan over L).
    @jax.jit
    def xla_step(x, w):
        def body(h, wl):
            y = jax.lax.dot_general(
                h, wl.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y[:, :I] * 1e-3).astype(jnp.bfloat16), None

        h, _ = jax.lax.scan(body, x, w, unroll=4)
        return h

    carry2 = {"x": x0}

    def run_xla():
        carry2["x"] = xla_step(carry2["x"], w)
        return carry2["x"]

    xla_ms = _timeit(run_xla, n=n)

    out = {
        "metric": "pallas_stream_bw",
        "L": L, "I": I, "O": O, "BI": BI,
        "pallas_ms": round(pallas_ms, 3),
        "pallas_gb_s": round(total_bytes / (pallas_ms / 1e3) / 1e9, 1),
        "xla_ms": round(xla_ms, 3),
        "xla_gb_s": round(total_bytes / (xla_ms / 1e3) / 1e9, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
