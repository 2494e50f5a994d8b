"""Sampling ops: JAX port of the reference's shared sampling semantics.

Mirrors reference sampling.py exactly in ORDER of operations (HF order):
suppress-mask -> suppress-tokens -> (argmax if greedy) -> temperature ->
top-k -> top-p -> categorical (reference sampling.py:32-66), and the
vectorized HF-style repetition penalty over the set of previously generated
tokens (reference sampling.py:10-29).

TPU-native differences:
- Stateless `jax.random` keys instead of torch RNG (seeds cannot match the
  reference bit-for-bit; parity is defined on greedy paths, as the reference's
  own tests do — reference tests/test_e2e_parity.py:210-215).
- The "unique token history" is carried as a vocab-sized boolean `seen` mask
  updated on-device each step, so the decode loop never syncs with the host.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Static sampling configuration (a jit static argument)."""

    temperature: float = 0.9
    top_k: int = 50
    top_p: float = 1.0
    do_sample: bool = True
    repetition_penalty: float = 1.05


def apply_repetition_penalty(
    logits: jax.Array, seen_mask: jax.Array, repetition_penalty: float
) -> jax.Array:
    """HF-style repetition penalty over previously generated token ids.

    logits: [..., V] float; seen_mask: [..., V] bool (True = token appeared in
    history). Equivalent to reference sampling.py:10-29: `token_history.unique()`
    is exactly the set of True entries of `seen_mask`.
    """
    if repetition_penalty == 1.0:
        return logits
    penalized = jnp.where(
        logits > 0, logits / repetition_penalty, logits * repetition_penalty
    )
    return jnp.where(seen_mask, penalized, logits)


def _mask_top_k(logits: jax.Array, top_k: int) -> jax.Array:
    k = min(top_k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def _mask_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # HF semantics: remove tokens once cumulative prob EXCEEDS top_p, always
    # keeping the most-probable token (reference sampling.py:57-63).
    remove = cum > top_p
    remove = remove.at[..., 0].set(False)
    # Threshold logit: smallest kept logit.
    kept = jnp.where(remove, _NEG_INF, sorted_logits)
    threshold = jnp.min(jnp.where(remove, jnp.inf, sorted_logits), axis=-1, keepdims=True)
    del kept
    return jnp.where(logits < threshold, _NEG_INF, logits)


def sample_logits(
    key: jax.Array,
    logits: jax.Array,
    params: SamplingParams,
    suppress_mask: Optional[jax.Array] = None,
    suppress_extra: Optional[jax.Array] = None,
) -> jax.Array:
    """Sample token ids from logits [..., V] -> [...].

    suppress_mask: static [V] bool mask (True = forbidden), the top-1024
    suppress band of reference generate.py:46-50.
    suppress_extra: dynamic [..., V] or [V] bool mask (e.g. EOS while under
    min_new_tokens), may be traced.
    """
    logits = logits.astype(jnp.float32)
    if suppress_mask is not None:
        logits = jnp.where(suppress_mask, _NEG_INF, logits)
    if suppress_extra is not None:
        logits = jnp.where(suppress_extra, _NEG_INF, logits)
    if not params.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / params.temperature
    if params.top_k > 0:
        logits = _mask_top_k(logits, params.top_k)
    if params.top_p < 1.0:
        logits = _mask_top_p(logits, params.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def make_suppress_mask(vocab_size: int, eos_id: int) -> jax.Array:
    """Suppress the top-1024 control ids except EOS (reference generate.py:46-50)."""
    ids = jnp.arange(vocab_size)
    start = max(0, vocab_size - 1024)
    return (ids >= start) & (ids != eos_id)
