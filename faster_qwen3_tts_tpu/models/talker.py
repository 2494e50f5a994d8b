"""Talker: the 28-layer Qwen3-style decoder that emits codebook-0 tokens.

TPU-native replacement for the upstream `talker` consumed by the reference
(SURVEY §2.4; reference generate.py:99-122 for the call surface):
- `text_embed` + `text_projection`  <-> talker.get_text_embeddings()/text_projection
- `codec_embed`                     <-> talker.get_input_embeddings()
- `codec_head`                      <-> talker.codec_head
- `spk_proj`                        <-> m.generate_speaker_prompt (x-vector -> hidden)
- `prefill` / decode via layers.stack_prefill / stack_decode
  (the variable-length HF prefill of reference generate.py:104-124 and the
  CUDA-graphed decode of reference talker_graph.py)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import TalkerConfig
from ..ops import quant
from . import layers
from .layers import KVCache, LayerShape


def layer_shape(cfg: TalkerConfig) -> LayerShape:
    return LayerShape(
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_eps=cfg.rms_norm_eps,
        sliding_window=cfg.sliding_window,
        layer_types=cfg.layer_types,
    )


def init_params(seed: int, cfg: TalkerConfig, dtype=jnp.bfloat16, rng=None):
    import numpy as np

    np_dtype = layers._np_dtype(dtype)
    # An explicit rng (the device-init sentinel) threads through everything;
    # the default path keeps the legacy per-submodule streams so committed
    # golden fixtures stay valid.
    layers_rng = rng
    rng = np.random.default_rng(seed) if rng is None else rng

    def init(*shape, scale=None):
        fan_in = shape[0] if len(shape) >= 2 else shape[-1]
        scale = scale if scale is not None else fan_in**-0.5
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(np_dtype)

    zeros = lambda *shape: np.zeros(shape, np_dtype)
    return {
        "text_embed": init(cfg.text_vocab_size, cfg.text_hidden_size, scale=0.02),
        "text_proj": {
            "w": init(cfg.text_hidden_size, cfg.hidden_size),
            "b": zeros(cfg.hidden_size),
        },
        "codec_embed": init(cfg.vocab_size, cfg.hidden_size, scale=0.02),
        "codec_head": init(cfg.hidden_size, cfg.vocab_size),
        "spk_proj": {
            "w": init(2048, cfg.hidden_size),
            "b": zeros(cfg.hidden_size),
        },
        "layers": layers.init_stacked_layers(
            seed + 1,
            cfg.num_hidden_layers,
            cfg.hidden_size,
            cfg.q_dim,
            cfg.kv_dim,
            cfg.head_dim,
            cfg.intermediate_size,
            dtype,
            rng=layers_rng,
        ),
        "final_norm": np.ones((cfg.hidden_size,), np_dtype),
    }


def embed_text(params, ids: jax.Array) -> jax.Array:
    """Raw text-embedding lookup (pre-projection), [..,S] -> [..,S,text_hidden]."""
    return jnp.take(params["text_embed"], ids, axis=0)


def text_project(params, x: jax.Array) -> jax.Array:
    p = params["text_proj"]
    y = quant.dot(x, p["w"]).astype(jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def text_hidden(params, ids: jax.Array) -> jax.Array:
    """text ids -> projected talker-width embeddings (text_projection(text_embed))."""
    return text_project(params, embed_text(params, ids))


def embed_codec(params, ids: jax.Array) -> jax.Array:
    return jnp.take(params["codec_embed"], ids, axis=0)


def codec_logits(params, h: jax.Array) -> jax.Array:
    return quant.dot(h, params["codec_head"]).astype(jnp.float32)


def speaker_project(params, xvec: jax.Array) -> jax.Array:
    """2048-d x-vector -> talker hidden (the generate_speaker_prompt analog)."""
    p = params["spk_proj"]
    y = jax.lax.dot_general(
        xvec.astype(jnp.float32),
        p["w"].astype(jnp.float32),
        (((xvec.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(p["w"].dtype)


def prefill(
    params,
    cfg: TalkerConfig,
    embeds: jax.Array,
    pad_mask: jax.Array,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Full-sequence prefill over a left-padded prompt.

    embeds: [B, P, H]; pad_mask: [B, P] (1 = real). Returns
    (last_hidden [B,1,H], logits_last [B,V] f32, cache with seq dim P).
    Rope positions start at 0 on the first REAL token (left-pad aware),
    matching reference talker_graph.py:172-196 semantics.
    """
    num_pads = jnp.sum(1 - pad_mask, axis=-1)  # [B]
    positions = jnp.arange(embeds.shape[1])[None, :] - num_pads[:, None]
    positions = jnp.maximum(positions, 0)
    h, cache = layers.stack_prefill(
        params["layers"],
        embeds,
        positions,
        pad_mask,
        layer_shape(cfg),
        cfg.rope_theta,
        params["final_norm"],
    )
    last = h[:, -1:, :]
    logits = codec_logits(params, last[:, 0, :])
    return last, logits, cache


def decode_step(
    params,
    cfg: TalkerConfig,
    x: jax.Array,
    pos: jax.Array,
    rope_pos: jax.Array,
    cache: KVCache,
    length_mask: jax.Array,
) -> Tuple[jax.Array, KVCache]:
    """One fixed-shape decode step (the TalkerGraph.run analog). Returns
    (hidden [B,1,H], updated cache)."""
    return layers.stack_decode(
        params["layers"],
        x,
        pos,
        rope_pos,
        cache,
        length_mask,
        layer_shape(cfg),
        cfg.rope_theta,
        params["final_norm"],
    )
