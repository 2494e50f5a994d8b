"""Attention ops (XLA).

The decode path is the hot op of the whole engine: one query token against a
static KV cache, 28x per talker frame + 5x15 per predictor frame (reference
per-step budget: README.md:477-484). It is implemented as a pure-XLA masked
softmax over the full static cache: always correct, runs anywhere (CPU
tests), and memory-bound-fast because XLA fuses the mask/softmax into the
matmuls.

Two hand-written Pallas kernels were built and A/B'd on the real chip and
BOTH lost to this XLA path, so neither ships (VERDICT r2 weak #4 / next #10,
forensics in BENCH_NOTES.md):
- a length-aware fused decode-attention kernel (11.89 vs 11.64 ms/frame at
  0.6B Q8_0, round 2);
- a whole-predictor-frame kernel holding all 5 layers' int8 weights
  VMEM-resident across the 16-token loop (round 3: 0.14-0.17 ms/frame vs
  XLA 0.08-0.12 interleaved in one process). The residency idea was already
  realized by XLA: within one predict_codebooks executable the unrolled
  15-pass loop keeps the int8 weights in VMEM — the kernel had no bandwidth
  left to save.
The env knobs FQ3T_PALLAS / FQ3T_DISABLE_PALLAS are accepted for
compatibility but both select the same XLA path now.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large finite negative; avoids NaNs from (-inf) - (-inf)


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """q: [B, Sq, Hq, D], k: [B, Sk, Hkv, D] -> scores [B, Hq, Sq, Sk] (f32)."""
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]
    group = Hq // Hkv
    qg = q.reshape(B, Sq, Hkv, group, D)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    return scores.reshape(B, Hq, Sq, k.shape[1]) * (D**-0.5)


def _gqa_out(probs: jax.Array, v: jax.Array) -> jax.Array:
    """probs: [B, Hq, Sq, Sk] f32, v: [B, Sk, Hkv, D] -> [B, Sq, Hq, D]."""
    B, Hq, Sq, Sk = probs.shape
    Hkv = v.shape[2]
    group = Hq // Hkv
    pg = probs.reshape(B, Hkv, group, Sq, Sk)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", pg, v.astype(jnp.float32))
    return out.reshape(B, Sq, Hq, v.shape[3])


def prefill_mask(
    pad_mask: jax.Array, sliding_window: Optional[int] = None
) -> jax.Array:
    """Build the [B, S, S] boolean attention mask for a left-padded prompt.

    pad_mask: [B, S] with 1 = real token. Causal, pad-aware, optionally
    sliding-window-limited (HF semantics: kv allowed iff
    `kpos > qpos - sliding_window`, matching transformers masking_utils'
    sliding_window_overlay; window distance is identical in index space and
    real-token space because left pads shift q and k positions equally)."""
    S = pad_mask.shape[1]
    qpos = jnp.arange(S)[:, None]
    kpos = jnp.arange(S)[None, :]
    allowed = kpos <= qpos
    if sliding_window is not None:
        allowed = allowed & (kpos > (qpos - sliding_window))
    return allowed[None, :, :] & (pad_mask[:, None, :] > 0)


def prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Full-sequence self-attention under an explicit boolean mask.

    q/k/v: [B, S, H(q|kv), D]; mask: [B, S, S] bool (True = attendable),
    from `prefill_mask`. Returns [B, S, Hq, D] in q.dtype.
    """
    scores = _gqa_scores(q, k)  # [B, Hq, S, S]
    scores = jnp.where(mask[:, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = _gqa_out(probs, v)
    return out.astype(q.dtype)


def decode_attention_xla(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    length_mask: jax.Array,
) -> jax.Array:
    """Single-token attention against the full static cache.

    q: [B, 1, Hq, D]; k_cache/v_cache: [B, S_max, Hkv, D];
    length_mask: [B, S_max] with 1 = attendable (covers the causal boundary:
    positions > current and left-pad positions are 0). Returns [B, 1, Hq, D].
    """
    scores = _gqa_scores(q, k_cache)  # [B, Hq, 1, S_max]
    scores = jnp.where(length_mask[:, None, None, :] > 0, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = _gqa_out(probs, v_cache)
    return out.astype(q.dtype)


def decode_attention(q, k_cache, v_cache, length_mask):
    """Single-token decode attention (see module docstring for why this is
    the XLA path and not a custom kernel)."""
    return decode_attention_xla(q, k_cache, v_cache, length_mask)
