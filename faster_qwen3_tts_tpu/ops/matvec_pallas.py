"""Pallas int8 matvec for the bandwidth-bound decode path (opt-in).

Honest on-chip measurement (benchmarks/matvec_bw.py, real-fetch-bounded)
shows XLA's stacked-layer decode matvec chain sustains only ~148-237 GB/s of
the chip's HBM bandwidth, and a minimal Mosaic grid-pipelined streaming
kernel beats it by ~25% on identical traffic (benchmarks/pallas_bw_probe.py:
280-296 GB/s vs 222-228 GB/s at the 1.7B gate/up geometry). This module is
that kernel productionized for the single-token decode case:

    y[B, O] = (x[B, I] @ q[I, O]) * scale[O]        (f32 accumulation)

Grid over I-blocks; each step DMAs a [BI, O] int8 weight block HBM->VMEM
(double-buffered by Mosaic's pipeline) and accumulates into a VMEM-resident
f32 output block, applying the per-output-channel scale once on the last
step. Same op order as ops.quant.dot's int8 branch, so results match to
f32-accumulation equivalence.

Opt-in via FQ3T_PALLAS_MATVEC=1 (read at trace time): ops.quant.dot routes
eligible decode-shaped calls (<=16 rows, 2D int8 weight, 128-aligned dims)
here. The reference's analog of this layer is the GGML quantized kernels
behind its CUDA path (reference ggml_backend.py); here it replaces the XLA
matvec lowering, not the framework structure.

Mosaic constraints honored (recorded round-3 lessons): int8 VMEM tiling
(32, 128) -> BI % 32 == 0 and O % 128 == 0; lane-dim block sizes are
multiples of 128.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def enabled() -> bool:
    if os.environ.get("FQ3T_DISABLE_PALLAS") == "1":  # global kill switch
        return False
    return os.environ.get("FQ3T_PALLAS_MATVEC", "0") == "1"


def _pick_bi(I: int) -> int:
    # The x BlockSpec is (B, BI): BI is a LANE dim, so it must be a multiple
    # of 128 (Mosaic lane tiling) — BI of 32/64 would satisfy the int8 VMEM
    # sublane constraint but violate the lane constraint and fail to compile
    # on real TPU (ADVICE r3 #2).
    for bi in (512, 256, 128):
        if I % bi == 0:
            return bi
    return 0


def eligible(x_rows: int, I: int, O: int) -> bool:
    return x_rows <= 16 and O % 128 == 0 and _pick_bi(I) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatvec(x2: jax.Array, q: jax.Array, scale: jax.Array, *, interpret: bool = False):
    """x2 [B, I] (bf16/f32), q [I, O] int8, scale [1, O] f32 -> [B, O] x2.dtype."""
    from jax.experimental import pallas as pl

    B, I = x2.shape
    O = q.shape[-1]
    BI = _pick_bi(I)
    nsteps = I // BI

    def kern(x_ref, q_ref, s_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot_general(
            x_ref[...],
            q_ref[...].astype(x_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == nsteps - 1)
        def _():
            o_ref[...] = o_ref[...] * s_ref[...]

    y = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((B, BI), lambda i: (0, i)),
            pl.BlockSpec((BI, O), lambda i: (i, 0)),
            pl.BlockSpec((1, O), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, O), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
        interpret=interpret,
    )(x2, q, scale)
    return y.astype(x2.dtype)
