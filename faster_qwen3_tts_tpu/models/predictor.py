"""Code predictor: 5-layer MTP transformer emitting codebooks 1..15 per frame.

TPU-native replacement for the reference's PredictorGraph (predictor_graph.py):
the ENTIRE 15-codebook loop — projection, 2-token prefill, 14 single-token
decodes, per-codebook lm_head, and sampling — is ONE jitted function
(`predict_codebooks`), the XLA analog of capturing the whole loop as a single
CUDA graph (reference predictor_graph.py:115-202).

Differences by design:
- Sampling uses `jax.random` with a per-step folded key instead of
  capture-time-frozen torch sampling (reference predictor_graph.py:34-50
  freezes do_sample/top_k/top_p/temperature at graph capture; here they are
  jit static args, so changing them costs one retrace, not a recapture).
- The 17-slot KV cache lives entirely in registers/VMEM for the duration of
  the fused loop; nothing round-trips to HBM between codebooks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PredictorConfig
from ..ops import quant
from ..ops.quant import QuantizedLinear
from ..ops.sampling import SamplingParams, sample_logits
from . import layers
from .layers import KVCache, LayerShape


def layer_shape(cfg: PredictorConfig) -> LayerShape:
    return LayerShape(
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_eps=cfg.rms_norm_eps,
        sliding_window=cfg.sliding_window,
        layer_types=cfg.layer_types,
    )


def init_params(seed: int, cfg: PredictorConfig, talker_hidden: int, dtype=jnp.bfloat16, rng=None):
    import numpy as np

    np_dtype = layers._np_dtype(dtype)
    # Explicit rng (device-init sentinel) threads through; default keeps the
    # legacy per-submodule streams so committed goldens stay valid.
    layers_rng = rng
    rng = np.random.default_rng(seed) if rng is None else rng

    def init(*shape, scale=None):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        scale = scale if scale is not None else fan_in**-0.5
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(np_dtype)

    return {
        # small_to_mtp_projection (reference predictor_graph.py:54)
        "mtp_proj": {
            "w": init(talker_hidden, cfg.hidden_size),
            "b": np.zeros((cfg.hidden_size,), np_dtype),
        },
        # per-codebook embeddings, stacked: [15, codebook_vocab, talker_hidden]
        "codec_embeds": init(cfg.num_codebooks, cfg.vocab_size, talker_hidden, scale=0.02),
        # per-codebook lm heads, stacked: [15, pred_hidden, codebook_vocab]
        "lm_heads": init(cfg.num_codebooks, cfg.hidden_size, cfg.vocab_size),
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


def mtp_project(params, x: jax.Array) -> jax.Array:
    p = params["mtp_proj"]
    y = quant.dot(x, p["w"]).astype(jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def embed_codebook(params, cb_index, token_ids: jax.Array) -> jax.Array:
    """Embed token(s) of codebook `cb_index` (0..14) in TALKER hidden width.

    Mirrors `predictor.get_input_embeddings()[i]` (reference generate.py:165).
    cb_index may be traced (gathered from the stacked table).
    """
    table = params["codec_embeds"][cb_index]  # [vocab, talker_hidden]
    return jnp.take(table, token_ids, axis=0)


def embed_frame_sum(params, codebook_tokens: jax.Array) -> jax.Array:
    """Sum of the 15 per-codebook embeddings for one frame.

    codebook_tokens: [B, 15] -> [B, talker_hidden]. This is the
    sum-of-16-embeddings talker input build (reference generate.py:162-166)
    minus the codebook-0 term (added by the caller from the talker table).
    """
    # one gather per codebook, vectorized: [15, B, H] -> sum over axis 0
    gathered = jax.vmap(lambda table, tok: jnp.take(table, tok, axis=0))(
        params["codec_embeds"], codebook_tokens.T
    )
    return jnp.sum(gathered.astype(jnp.float32), axis=0).astype(params["codec_embeds"].dtype)


def _head_logits(params, cb_index, h: jax.Array) -> jax.Array:
    """lm_head[cb_index] over h [B, pred_hidden] -> [B, codebook_vocab] f32."""
    heads = params["lm_heads"]
    if isinstance(heads, (QuantizedLinear, quant.QuantizedLinear4)):
        w = type(heads)(*(f[cb_index] for f in heads))
    else:
        w = heads[cb_index]
    return quant.dot(h, w).astype(jnp.float32)


def predict_codebooks(
    params,
    cfg: PredictorConfig,
    pred_input: jax.Array,
    key: jax.Array,
    sampling: SamplingParams,
) -> jax.Array:
    """The full fused 15-codebook loop (PredictorGraph._full_loop analog,
    reference predictor_graph.py:115-167).

    pred_input: [B, 2, talker_hidden] = concat(past_hidden, codec0_embed).
    Returns codebook tokens [B, 15] int32.
    """
    B = pred_input.shape[0]
    shape = layer_shape(cfg)
    h = mtp_project(params, pred_input)  # [B, 2, pred_hidden]

    # --- 2-token prefill ---
    positions = jnp.broadcast_to(jnp.arange(2)[None, :], (B, 2))
    pad_mask = jnp.ones((B, 2), jnp.int32)
    hs, cache_p = layers.stack_prefill(
        params["layers"], h, positions, pad_mask, shape, cfg.rope_theta, params["final_norm"]
    )

    # Expand the 2-slot prefill cache into the full 17-slot static cache.
    L = cfg.num_hidden_layers
    full = KVCache.zeros(L, B, cfg.max_seq, cfg.num_key_value_heads, cfg.head_dim, cache_p.k.dtype)
    full = KVCache(
        k=jax.lax.dynamic_update_slice(full.k, cache_p.k, (0, 0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(full.v, cache_p.v, (0, 0, 0, 0, 0)),
    )

    logits0 = _head_logits(params, 0, hs[:, -1, :])
    tok0 = sample_logits(jax.random.fold_in(key, 0), logits0, sampling)  # [B]

    # --- 14 single-token decode steps ---
    def body(carry, step):
        cache, tok = carry
        # embed previous token with codebook-(step-1) embedding, project to MTP width
        emb = embed_codebook(params, step - 1, tok)[:, None, :]  # [B,1,talker_hidden]
        x = mtp_project(params, emb)
        pos = jnp.full((B,), step + 1, jnp.int32)  # cache positions 2..15
        rope_pos = pos
        length_mask = (jnp.arange(cfg.max_seq)[None, :] <= (step + 1)).astype(jnp.int32)
        length_mask = jnp.broadcast_to(length_mask, (B, cfg.max_seq))
        hd, cache = layers.stack_decode(
            params["layers"], x, pos, rope_pos, cache, length_mask,
            shape, cfg.rope_theta, params["final_norm"],
        )
        logits = _head_logits(params, step, hd[:, 0, :])
        tok = sample_logits(jax.random.fold_in(key, step), logits, sampling)
        return (cache, tok), tok

    import os

    # The 14 sequential steps are tiny programs (5-layer stack over 1 token);
    # unrolling lets XLA fuse across steps and overlap weight streaming with
    # compute. Default: fully inlined (on-chip A/B: Q8_0 decode 55 -> 33.6
    # ms/chunk combined with the layer-scan unroll).
    unroll = max(1, int(os.environ.get("FQ3T_PRED_UNROLL", "14")))
    steps = jnp.arange(1, cfg.num_codebooks)
    (_, _), toks = jax.lax.scan(body, (full, tok0), steps, unroll=unroll)
    # toks: [14, B]; prepend tok0 -> [B, 15]
    all_toks = jnp.concatenate([tok0[None, :], toks], axis=0)
    return jnp.transpose(all_toks, (1, 0))
