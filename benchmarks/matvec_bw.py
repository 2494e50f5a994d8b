"""Effective HBM bandwidth of the decode-critical matvec shapes.

The AR decode step is a chain of [1, H] x [H, O] matvecs streaming every
weight byte per frame (reference README.md:477-484 frames the same budget on
GPU). RTF headroom analysis needs ONE number per shape: what fraction of the
chip's ~819 GB/s does XLA actually sustain on a B=1 int8/bf16 matvec? If the
answer is near peak, the decode gap vs the weight-streaming roofline is
structural (scan overhead, attention, sampling) and a hand kernel can't help;
if it is a small fraction, the matvec itself is the target.

Shapes cover both model sizes' dominant terms:
  MLP gate/up [H, I], MLP down [I, H], fused QKV, attn out, codec head.

    QUANT=Q8_0 python benchmarks/matvec_bw.py
Prints one JSON line per shape: ms/call, effective GB/s, plus a whole-layer
chained variant (the real decode pattern: matvecs back-to-back with a data
dependency, letting XLA overlap weight streams across ops).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _timeit(fn, n=200, warmup=3):
    """Amortized per-call wall time with a REAL device->host fetch at the end.

    On this tunneled platform `jax.block_until_ready` returns without forcing
    execution (measured: 28-layer chained scans "complete" in 0.02 ms =
    88 TB/s), so the pipeline must be drained by an actual fetch
    (np.asarray). The single fetch RTT (~30 ms) divided by n is the noise
    floor (~0.3 ms at n=100)."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])  # drain warmup before timing
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from faster_qwen3_tts_tpu.ops import quant

    quant_mode = os.environ.get("QUANT", "Q8_0")
    n = int(os.environ.get("FQ3T_PROFILE_N", "200"))
    rng = np.random.default_rng(0)

    # (label, in_dim, out_dim) — decode-path matvec shapes for 0.6B and 1.7B.
    shapes = [
        ("0.6b_mlp_gateup", 1024, 6144),   # gate+up fused
        ("0.6b_mlp_down", 3072, 1024),
        ("0.6b_qkv", 1024, 3072),
        ("1.7b_mlp_gateup", 2048, 12288),
        ("1.7b_mlp_down", 6144, 2048),
        ("1.7b_qkv", 2048, 6144),
        ("codec_head", 2048, 3072),
    ]

    results = {}
    for label, i_dim, o_dim in shapes:
        w = rng.standard_normal((i_dim, o_dim), dtype=np.float32) * 0.02
        if quant_mode == "Q8_0":
            wq = quant.quantize_linear(w)
            wq = jax.device_put(
                quant.QuantizedLinear(
                    q=jnp.asarray(wq.q), scale=jnp.asarray(wq.scale)
                )
            )
            bytes_per_call = i_dim * o_dim + 4 * o_dim
        else:
            wq = jax.device_put(jnp.asarray(w, jnp.bfloat16))
            bytes_per_call = 2 * i_dim * o_dim
        x = jax.device_put(jnp.asarray(rng.standard_normal((1, i_dim)), jnp.bfloat16))

        # Feedback perturbation: each call's x depends on the previous call's
        # y, so no two dispatches carry identical (program, args) — defeating
        # the remote dispatch memoization that yields unphysical >819 GB/s
        # readings on repeated identical calls (same defense as the chained
        # scan below; ADVICE r3 #3). The extra mean+scale is O(o_dim) FLOPs,
        # negligible against the weight stream.
        def step_fn(xx, ww):
            y = quant.dot(xx, ww)
            x_next = xx * (1 + 1e-6 * jnp.mean(y).astype(xx.dtype))
            return y, x_next

        fn = jax.jit(step_fn)

        state = {"x": x}

        def one_call():
            y, state["x"] = fn(state["x"], wq)
            return y

        ms = _timeit(one_call, n=n)
        gbs = bytes_per_call / (ms / 1e3) / 1e9
        results[label] = {"ms": round(ms, 4), "gb_s": round(gbs, 1)}
        print(f"  {label}: {ms:.4f} ms  {gbs:.0f} GB/s", file=sys.stderr, flush=True)

    # IN-PROGRAM chained layer pass: lax.scan over L DISTINCT stacked layer
    # weights with the activation carried — a synthetic talker decode step.
    # This forces L sequential weight streams inside ONE executable, immune
    # to the cross-dispatch overlap/caching that makes the single-matvec
    # numbers above unphysical (>819 GB/s observed on repeated identical
    # dispatches through the tunnel). L x bytes far exceeds VMEM, so ms/call
    # divided into total weight bytes IS sustained HBM bandwidth.
    L = int(os.environ.get("FQ3T_SCAN_LAYERS", "28"))
    for label, H, I in (("0.6b", 1024, 3072), ("1.7b", 2048, 6144)):
        unroll = int(os.environ.get("FQ3T_SCAN_UNROLL", "4"))

        def mkstack(a, b):
            w = rng.standard_normal((L, a, b), dtype=np.float32) * 0.02
            if quant_mode == "Q8_0":
                q = quant.quantize_linear(w)  # per-channel over axis -2
                return jax.device_put(
                    quant.QuantizedLinear(q=jnp.asarray(q.q), scale=jnp.asarray(q.scale))
                )
            return jax.device_put(jnp.asarray(w, jnp.bfloat16))

        stacks = {
            "qkv": mkstack(H, 3 * H),
            "o": mkstack(H, H),
            "gu": mkstack(H, 2 * I),
            "dn": mkstack(I, H),
        }
        wbytes = H * 3 * H + H * H + H * 2 * I + I * H
        layer_bytes = wbytes if quant_mode == "Q8_0" else 2 * wbytes

        # FQ3T_MATVEC_VARIANT=reduce: formulate the matvec as an elementwise
        # multiply + reduction over the input dim (VPU streaming) instead of
        # dot_general (MXU). If the MXU path materializes the int8->bf16
        # dequant as a separate bf16 copy, the reduce form — whose convert
        # fuses trivially into the multiply pipeline — should stream the
        # int8 bytes at a much higher effective rate.
        variant = os.environ.get("FQ3T_MATVEC_VARIANT", "dot")

        def qdot(h, lw):
            if variant == "reduce" and isinstance(lw, quant.QuantizedLinear):
                y = jnp.sum(
                    h.reshape(-1)[:, None] * lw.q.astype(jnp.float32), axis=0
                )
                return (y * lw.scale.astype(jnp.float32).reshape(-1)).astype(h.dtype)[None, :]
            return quant.dot(h, lw)

        def one_layer(h, lw):
            a = qdot(h, lw["qkv"])[:, :H]
            a = qdot(a, lw["o"])
            g = qdot(a, lw["gu"])
            g = (
                jax.nn.silu(g[:, :I].astype(jnp.float32)) * g[:, I:].astype(jnp.float32)
            ).astype(h.dtype)
            return qdot(g, lw["dn"]), None

        def chain(xx, ws):
            h, _ = jax.lax.scan(one_layer, xx, ws, unroll=unroll)
            return h

        chain_fn = jax.jit(chain)
        x = jax.device_put(jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16))

        # Feed each call's output back as the next input: distinct arguments
        # per dispatch (defeats any remote (program, args) execution
        # memoization — observed: repeated IDENTICAL dispatches return in
        # ~0 device time) and a true serialization chain across calls.
        carry = {"x": x}

        def step():
            carry["x"] = chain_fn(carry["x"], stacks)
            return carry["x"]

        ms = _timeit(step, n=max(20, n // 10))
        gbs = L * layer_bytes / (ms / 1e3) / 1e9
        results[f"{label}_scan_{L}layers"] = {
            "ms": round(ms, 4), "gb_s": round(gbs, 1), "ms_per_layer": round(ms / L, 4),
        }
        print(f"  {label} scan x{L} (unroll={unroll}): {ms:.4f} ms  {gbs:.0f} GB/s",
              file=sys.stderr, flush=True)

    print(json.dumps({"metric": "matvec_bw", "quant": quant_mode, "results": results}), flush=True)


if __name__ == "__main__":
    main()
