"""Functional JAX building blocks shared by the talker and code predictor.

Design notes (TPU-first):
- Pure functions over parameter pytrees; no module state. `jax.jit` of a
  fixed-shape decode step plays the role the reference's CUDA-graph capture
  plays on GPU (reference talker_graph.py:109-147): trace once, replay as a
  cached executable.
- Per-layer parameters are STACKED along a leading layer axis and the layer
  loop is a `lax.scan`. This keeps compile time O(1) in depth and lets XLA
  pipeline HBM weight streaming with MXU compute.
- All matmuls request float32 accumulation (`preferred_element_type`) and then
  cast back to the activation dtype, matching MXU-native bf16xbf16->f32.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import decode_attention, prefill_attention, prefill_mask


class KVCache(NamedTuple):
    """Static-shape KV cache for one transformer stack.

    k, v: [num_layers, batch, max_seq, num_kv_heads, head_dim]

    The TPU-native equivalent of `transformers.StaticCache`
    (reference talker_graph.py:43): preallocated, updated in place with
    `lax.dynamic_update_slice` inside the jitted step, donated across steps.
    """

    k: jax.Array
    v: jax.Array

    @classmethod
    def zeros(cls, num_layers, batch, max_seq, num_kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (num_layers, batch, max_seq, num_kv_heads, head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


def rms_norm(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (w.astype(jnp.float32) * y).astype(dtype)


from ..ops.quant import dot as _dot  # handles plain + int8-quantized weights


def _np_dtype(dtype):
    """jnp dtype -> numpy dtype usable for host-side param construction."""
    import numpy as np

    import ml_dtypes

    if dtype == jnp.bfloat16:
        return ml_dtypes.bfloat16
    return np.dtype(dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """positions [..., S] -> cos/sin [..., S, head_dim] (HF 'cat' layout)."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., S, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin: [B, S, D] (broadcast over heads)."""
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class LayerShape:
    """Static attention geometry for one decoder stack.

    `layer_types` mirrors the upstream config's per-layer attention kinds
    ("full_attention" | "sliding_attention"); when None and a sliding window
    is set, every layer is sliding (HF default derivation). The reference
    builds the sliding masks per layer type the same way
    (/root/reference/faster_qwen3_tts/predictor_graph.py:58,96-105)."""

    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_eps: float
    sliding_window: Optional[int] = None
    layer_types: Optional[Tuple[str, ...]] = None

    def sliding_flags(self, num_layers: int) -> Tuple[bool, ...]:
        """Per-layer 'uses the sliding-window mask' flags."""
        if self.sliding_window is None:
            return (False,) * num_layers
        if self.layer_types is None:
            return (True,) * num_layers
        if len(self.layer_types) != num_layers:
            raise ValueError(
                f"layer_types has {len(self.layer_types)} entries for "
                f"{num_layers} layers"
            )
        return tuple(t == "sliding_attention" for t in self.layer_types)


def _qkv(lp, x, shape: LayerShape):
    B, S, _ = x.shape
    qd = shape.num_heads * shape.head_dim
    kd = shape.num_kv_heads * shape.head_dim
    if "wqkv" in lp:
        # fused projection (ops.quant.fuse_layer_weights): one matmul, then
        # static output splits — numerically identical per output column
        y = _dot(x, lp["wqkv"])
        q, k, v = y[..., :qd], y[..., qd : qd + kd], y[..., qd + kd :]
    else:
        q, k, v = _dot(x, lp["wq"]), _dot(x, lp["wk"]), _dot(x, lp["wv"])
    q = q.reshape(B, S, shape.num_heads, shape.head_dim)
    k = k.reshape(B, S, shape.num_kv_heads, shape.head_dim)
    v = v.reshape(B, S, shape.num_kv_heads, shape.head_dim)
    # Qwen3-style per-head-dim q/k RMSNorm.
    q = rms_norm(lp["q_norm"], q, shape.rms_eps)
    k = rms_norm(lp["k_norm"], k, shape.rms_eps)
    return q, k, v


def _mlp(lp, x):
    if "w_gateup" in lp:
        y = _dot(x, lp["w_gateup"])
        inter = y.shape[-1] // 2
        gate, up = y[..., :inter], y[..., inter:]
    else:
        gate = _dot(x, lp["w_gate"])
        up = _dot(x, lp["w_up"])
    return _dot(jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up, lp["w_down"])


def layer_prefill(
    lp,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    shape: LayerShape,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One decoder layer over a full (padded) sequence.

    x: [B, S, H]; mask: [B, S, S] bool (True = attendable). Returns
    (y, (k, v)) with k/v: [B, S, kv_heads, head_dim] for cache insertion.
    """
    h = rms_norm(lp["ln1"], x, shape.rms_eps)
    q, k, v = _qkv(lp, h, shape)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = prefill_attention(q, k, v, mask)
    B, S, _, _ = attn.shape
    attn = _dot(attn.reshape(B, S, -1), lp["wo"])
    x = x + attn
    h = rms_norm(lp["ln2"], x, shape.rms_eps)
    x = x + _mlp(lp, h)
    return x, (k, v)


def layer_decode(
    lp,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    length_mask: jax.Array,
    shape: LayerShape,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One decoder layer for a single-token decode step with static KV cache.

    x: [B, 1, H]; k_cache/v_cache: [B, S_max, kv, hd]; pos: [B] int32 write
    position; length_mask: [B, S_max] (1 = attendable; already restricted to
    this layer's window for sliding layers). Returns the layer output and
    the UPDATED caches.
    """
    h = rms_norm(lp["ln1"], x, shape.rms_eps)
    q, k, v = _qkv(lp, h, shape)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # In-place cache write at `pos` (per batch element).
    def write(cache, new):
        def one(c, n, p):
            return jax.lax.dynamic_update_slice(c, n, (p, 0, 0))

        return jax.vmap(one)(cache, new, pos)

    k_cache = write(k_cache, k)
    v_cache = write(v_cache, v)

    attn = decode_attention(q, k_cache, v_cache, length_mask)
    B = attn.shape[0]
    attn = _dot(attn.reshape(B, 1, -1), lp["wo"])
    x = x + attn
    h = rms_norm(lp["ln2"], x, shape.rms_eps)
    x = x + _mlp(lp, h)
    return x, (k_cache, v_cache)


def stack_prefill(
    stacked_params,
    x: jax.Array,
    positions: jax.Array,
    pad_mask: jax.Array,
    shape: LayerShape,
    rope_theta: float,
    final_norm: jax.Array,
) -> Tuple[jax.Array, KVCache]:
    """Run a full decoder stack over a padded sequence via lax.scan on layers.

    positions: [B, S] rope positions (already offset for left padding).
    Returns (normed hidden states [B, S, H], KVCache with seq dim = S).
    """
    cos, sin = rope_cos_sin(positions, shape.head_dim, rope_theta)
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    flags = shape.sliding_flags(num_layers)

    full = prefill_mask(pad_mask)
    if any(flags):
        slide = prefill_mask(pad_mask, shape.sliding_window)

        def body(carry, inputs):
            lp, is_slide = inputs
            mask = jnp.where(is_slide, slide, full)
            h, (k, v) = layer_prefill(lp, carry, cos, sin, mask, shape)
            return h, (k, v)

        xs = (stacked_params, jnp.asarray(flags))
    else:

        def body(carry, lp):
            h, (k, v) = layer_prefill(lp, carry, cos, sin, full, shape)
            return h, (k, v)

        xs = stacked_params

    h, (ks, vs) = jax.lax.scan(body, x, xs)
    h = rms_norm(final_norm, h, shape.rms_eps)
    return h, KVCache(k=ks, v=vs)


def stack_decode(
    stacked_params,
    x: jax.Array,
    pos: jax.Array,
    rope_pos: jax.Array,
    cache: KVCache,
    length_mask: jax.Array,
    shape: LayerShape,
    rope_theta: float,
    final_norm: jax.Array,
) -> Tuple[jax.Array, KVCache]:
    """Single-token decode through the whole stack (the TalkerGraph.run analog,
    reference talker_graph.py:198-214).

    x: [B, 1, H]; pos: [B] cache write position; rope_pos: [B] rope position
    (pos + rope_delta, reference talker_graph.py:209-211); length_mask: [B, S_max].
    Sliding layers additionally exclude cache slots at or below
    `pos - sliding_window` (kv allowed iff `kv_idx > pos - window`, the HF
    sliding-mask rule applied to the single-query decode case).
    """
    cos, sin = rope_cos_sin(rope_pos[:, None], shape.head_dim, rope_theta)
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    flags = shape.sliding_flags(num_layers)

    if any(flags):
        s_ids = jnp.arange(length_mask.shape[-1])[None, :]
        slide_mask = length_mask * (s_ids > (pos[:, None] - shape.sliding_window))

        def body(carry, inputs):
            lp, k_cache, v_cache, is_slide = inputs
            mask = jnp.where(is_slide, slide_mask, length_mask)
            h, (k_cache, v_cache) = layer_decode(
                lp, carry, cos, sin, k_cache, v_cache, pos, mask, shape
            )
            return h, (k_cache, v_cache)

        h, (ks, vs) = jax.lax.scan(
            body,
            x,
            (stacked_params, cache.k, cache.v, jnp.asarray(flags)),
            unroll=_decode_unroll(),
        )
        h = rms_norm(final_norm, h, shape.rms_eps)
        return h, KVCache(k=ks, v=vs)

    def body(carry, inputs):
        h = carry
        lp, k_cache, v_cache = inputs
        h, (k_cache, v_cache) = layer_decode(
            lp, h, cos, sin, k_cache, v_cache, pos, length_mask, shape
        )
        return h, (k_cache, v_cache)

    h, (ks, vs) = jax.lax.scan(
        body, x, (stacked_params, cache.k, cache.v), unroll=_decode_unroll()
    )
    h = rms_norm(final_norm, h, shape.rms_eps)
    return h, KVCache(k=ks, v=vs)


def _decode_unroll() -> int:
    """Layer-scan unroll factor for the decode step (FQ3T_SCAN_UNROLL).

    Unrolling lets XLA overlap layer l+1's HBM weight streaming with layer
    l's compute inside the scan body — the decode step is bandwidth-bound,
    so this is the main single-op lever. On-chip A/B (0.6B, decode-only
    chunk): BF16 99.2 -> 65.0 ms/chunk at unroll=4 (unroll=8 regresses to
    88.5); with the predictor loop also unrolled, Q8_0 hits 33.6 ms/chunk
    (4.2 ms/frame). Default 4; 1 = strict scan.
    """
    import os

    return max(1, int(os.environ.get("FQ3T_SCAN_UNROLL", "4")))


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def stack_host(xs):
    """np.stack that stays O(1) for constant broadcast views.

    The device-init skeleton (weights._SentinelRng) represents every random
    leaf as a zero-strided broadcast of one scalar; np.stack would copy each
    one element-by-element (~minutes on a single-core host for the codec
    transformer). Same-valued broadcast views stack to a bigger broadcast
    view instead. Real (contiguous) arrays take the normal np.stack path.
    """
    import numpy as np

    x0 = xs[0]
    if (
        isinstance(x0, np.ndarray)
        and x0.size
        and not any(x0.strides)
        and all(
            isinstance(x, np.ndarray)
            and x.shape == x0.shape
            and x.dtype == x0.dtype
            and not any(x.strides)
            and x.flat[0] == x0.flat[0]
            for x in xs[1:]
        )
    ):
        return np.broadcast_to(x0.flat[0], (len(xs),) + x0.shape)
    return np.stack(xs)


def init_stacked_layers(
    seed: int,
    num_layers: int,
    hidden: int,
    q_dim: int,
    kv_dim: int,
    head_dim: int,
    intermediate: int,
    dtype=jnp.bfloat16,
    rng=None,
):
    """Random-init stacked decoder-layer params (testing / benchmarking when
    no checkpoint is available; real weights come from weights.load_pretrained).

    Host-side numpy ONLY (ml_dtypes for bf16): init must neither trigger
    per-shape XLA compiles nor per-array device transfers — the caller ships
    the whole pytree in one batched jax.device_put (weights.init_all).
    """
    import numpy as np

    np_dtype = _np_dtype(dtype)
    rng = np.random.default_rng(seed) if rng is None else rng
    s = lambda *shape: (num_layers,) + shape

    def init(*shape, scale=None):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        scale = scale if scale is not None else fan_in**-0.5
        return (rng.standard_normal(s(*shape), dtype=np.float32) * scale).astype(np_dtype)

    ones = lambda *shape: np.ones(s(*shape), np_dtype)
    return {
        "wq": init(hidden, q_dim),
        "wk": init(hidden, kv_dim),
        "wv": init(hidden, kv_dim),
        "wo": init(q_dim, hidden),
        "w_gate": init(hidden, intermediate),
        "w_up": init(hidden, intermediate),
        "w_down": init(intermediate, hidden),
        "q_norm": ones(head_dim),
        "k_norm": ones(head_dim),
        "ln1": ones(hidden),
        "ln2": ones(hidden),
    }
