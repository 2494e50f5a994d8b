"""Pallas fused decode-attention kernel with range-aware block skipping.

The hot attention op of the decode loop: one query token against the static
KV cache (28x per frame). The XLA path reads the ENTIRE [S_max] cache every
step even when only a prefix is live; this kernel walks the cache in blocks
and predicates out blocks fully outside the live [lo, hi) range (left pads
below lo, unwritten slots from hi up), cutting HBM attention traffic by
S_max/seq_len — e.g. 16x early in a 2048-slot cache.

Flash-style streaming softmax: per block, running (max, sum, weighted acc) in
VMEM scratch; normalize on the last block. Grid: one step per cache block,
vmapped over kv heads and batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_S = 256  # cache slots per grid step


def _kernel(bounds_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """Grid: (num_blocks,). q_ref [G, D]; k_ref/v_ref [BLOCK_S, D]; o_ref [G, D].
    bounds_ref (scalar prefetch): [2] = (lo, hi) live slot range."""
    j = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    lo = bounds_ref[0]
    hi = bounds_ref[1]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block_start = j * BLOCK_S

    @pl.when((block_start < hi) & (block_start + BLOCK_S > lo))
    def _compute():
        q = q_ref[:].astype(jnp.float32)  # [G, D]
        k = k_ref[:].astype(jnp.float32)  # [S, D]
        v = v_ref[:].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, S]
        ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + block_start
        s = jnp.where((ids >= lo) & (ids < hi), s, -1e30)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [G, S]
        alpha = jnp.exp(m_prev - m_new)  # [G, 1]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

    @pl.when(j == n_blocks - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def decode_attention_pallas(q, k_cache, v_cache, length_mask):
    """q: [B, 1, Hq, D]; caches: [B, S_max, Hkv, D]; length_mask: [B, S_max]
    with a CONTIGUOUS live range [lo, hi) per batch element (the engine's
    decode masks are always `num_pads <= s <= pos`). Matches
    ops.attention.decode_attention_xla for such masks."""
    B, _, Hq, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    G = Hq // Hkv
    scale = D**-0.5

    mask = length_mask > 0
    hi = jnp.sum(mask, axis=-1).astype(jnp.int32) + jnp.argmax(mask, axis=-1).astype(jnp.int32)
    lo = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    bounds = jnp.stack([lo, hi], axis=-1)  # [B, 2]

    n_blocks = (S + BLOCK_S - 1) // BLOCK_S

    def one_head(qh, kh, vh, bd):
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((G, D), lambda j, bd: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLOCK_S, D), lambda j, bd: (j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLOCK_S, D), lambda j, bd: (j, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((G, D), lambda j, bd: (0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((G, 1), jnp.float32),
                    pltpu.VMEM((G, 1), jnp.float32),
                    pltpu.VMEM((G, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((G, D), qh.dtype),
        )(bd, qh, kh, vh)

    def one_batch(qb, kb, vb, bd):
        qg = (qb * scale).reshape(Hkv, G, D).astype(qb.dtype)
        kt = jnp.transpose(kb, (1, 0, 2))
        vt = jnp.transpose(vb, (1, 0, 2))
        return jax.vmap(one_head, in_axes=(0, 0, 0, None))(qg, kt, vt, bd)

    out = jax.vmap(one_batch)(q[:, 0], k_cache, v_cache, bounds)
    return out.reshape(B, 1, Hq, D)
