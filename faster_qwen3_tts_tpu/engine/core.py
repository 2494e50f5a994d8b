"""Fused on-device generation engine.

This is the TPU-native answer to the reference's CUDA-graph decode loop
(reference generate.py:145-199): instead of replaying two captured graphs per
frame with a host `token.item()` EOS sync every step (the reference's main
overhead, SURVEY §2.3), we fuse

    talker decode step (28 layers)
  + codec head + repetition penalty + sampling
  + code-predictor 15-codebook loop (incl. its own sampling)
  + next-step input embedding build

into ONE jitted `decode_chunk` that runs `chunk_size` frames under `lax.scan`
entirely on device, carrying an EOS `done` flag. The host syncs once per
chunk — which is exactly the granularity the streaming API already exposes
(reference streaming.py:157-173), so TTFA semantics are preserved while the
per-step host round-trip disappears.

KV caches are donated across chunk calls, so XLA updates them in place
(the StaticCache analog, reference talker_graph.py:43).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import PredictorConfig, TalkerConfig
from ..models import predictor as predictor_lib
from ..models import talker as talker_lib
from ..models.layers import KVCache
from ..ops.sampling import SamplingParams, apply_repetition_penalty, make_suppress_mask, sample_logits


class DecodeState(NamedTuple):
    """Everything the device needs to generate the next frame."""

    cache: KVCache  # talker static KV cache [L, B, S_max, kv, hd]
    pos: jax.Array  # [B] int32 next cache write position
    num_pads: jax.Array  # [B] int32 left-pad counts (mask + rope delta)
    token: jax.Array  # [B] int32 current codebook-0 token (already sampled)
    past_hidden: jax.Array  # [B, 1, H] last talker hidden state
    gen_step: jax.Array  # [B] int32 index into trailing text hiddens
    seen: jax.Array  # [B, V] bool history mask for repetition penalty
    key: jax.Array  # PRNG key
    done: jax.Array  # [B] bool EOS (or length bound) reached
    n_frames: jax.Array  # [B] int32 frames emitted so far


def expand_cache(cache: KVCache, max_seq: int) -> KVCache:
    """Embed a length-P prefill cache at offset 0 of a length-S_max cache
    (the prefill_kv copy, reference talker_graph.py:153-170)."""
    L, B, P, KV, HD = cache.k.shape
    if P > max_seq:
        raise ValueError(f"prefill length {P} exceeds max_seq_len {max_seq}")
    full = KVCache.zeros(L, B, max_seq, KV, HD, cache.k.dtype)
    return KVCache(
        k=jax.lax.dynamic_update_slice(full.k, cache.k, (0, 0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(full.v, cache.v, (0, 0, 0, 0, 0)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("talker_cfg", "max_seq", "sampling", "min_new_tokens"),
)
def start_state(
    talker_params,
    talker_cfg: TalkerConfig,
    embeds: jax.Array,
    pad_mask: jax.Array,
    key: jax.Array,
    max_seq: int,
    sampling: SamplingParams,
    min_new_tokens: int,
) -> Tuple[DecodeState, jax.Array]:
    """Prefill + first-token sampling -> initial DecodeState.

    embeds: [B, P, H] left-padded prompt embeddings; pad_mask: [B, P].
    Compiled once per (P bucket) — the analog of the reference's
    variable-length HF prefill + graph state setup (generate.py:104-140).
    Returns (state, prefill logits [B, V] f32) — logits exposed for tests.
    """
    B, P, H = embeds.shape
    past_hidden, logits, cache_p = talker_lib.prefill(talker_params, talker_cfg, embeds, pad_mask)
    cache = expand_cache(cache_p, max_seq)

    eos = talker_cfg.codec_eos_token_id
    suppress = make_suppress_mask(talker_cfg.vocab_size, eos)
    extra = None
    if min_new_tokens > 0:
        extra = jnp.arange(talker_cfg.vocab_size) == eos
    key, sub = jax.random.split(key)
    token = sample_logits(sub, logits, sampling, suppress_mask=suppress, suppress_extra=extra)

    num_pads = jnp.sum(1 - pad_mask, axis=-1).astype(jnp.int32)
    state = DecodeState(
        cache=cache,
        pos=jnp.full((B,), P, jnp.int32),
        num_pads=num_pads,
        token=token.astype(jnp.int32),
        past_hidden=past_hidden,
        gen_step=jnp.zeros((B,), jnp.int32),
        seen=jnp.zeros((B, talker_cfg.vocab_size), jnp.bool_),
        key=key,
        done=jnp.zeros((B,), jnp.bool_),
        n_frames=jnp.zeros((B,), jnp.int32),
    )
    return state, logits


@functools.partial(jax.jit, donate_argnames=("state",))
def insert_slot(
    state: DecodeState,
    slot_state: DecodeState,
    slot: jax.Array,  # () int32 target lane
) -> DecodeState:
    """Insert a freshly-prefilled B=1 stream into lane `slot` of a running
    batch state — the continuous-batching primitive (VERDICT r4 next #6):
    a new request joins at a chunk boundary instead of cold-starting every
    lane's prefill in lockstep. All per-lane fields are dynamic-slice
    updates; the batch KV cache is donated, so XLA rewrites the one lane in
    place. `slot_state` must come from the same (max_seq, vocab) geometry
    (the standard B=1 `start_state` output)."""
    z = jnp.zeros((), jnp.int32)

    def lane(dst, src, batch_dim):
        idx = tuple(slot if d == batch_dim else z for d in range(src.ndim))
        return jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype), idx)

    return DecodeState(
        cache=KVCache(
            k=lane(state.cache.k, slot_state.cache.k, 1),
            v=lane(state.cache.v, slot_state.cache.v, 1),
        ),
        pos=lane(state.pos, slot_state.pos, 0),
        num_pads=lane(state.num_pads, slot_state.num_pads, 0),
        token=lane(state.token, slot_state.token, 0),
        past_hidden=lane(state.past_hidden, slot_state.past_hidden, 0),
        gen_step=lane(state.gen_step, slot_state.gen_step, 0),
        seen=lane(state.seen, slot_state.seen, 0),
        key=state.key,  # one PRNG chain per batch; lanes share splits
        done=lane(state.done, slot_state.done, 0),
        n_frames=lane(state.n_frames, slot_state.n_frames, 0),
    )


@functools.partial(jax.jit, donate_argnames=("state",))
def release_slot(state: DecodeState, slot: jax.Array) -> DecodeState:
    """Mark lane `slot` done (its frames mask invalid until re-used): the
    host-side budget stop / cancel for continuous batching."""
    done = state.done.at[slot].set(True)
    return state._replace(done=done)


def _decode_frame(
    talker_params,
    pred_params,
    talker_cfg: TalkerConfig,
    pred_cfg: PredictorConfig,
    state: DecodeState,
    trailing_text: jax.Array,  # [B, T, H]
    tts_pad_embed: jax.Array,  # [B, 1, H]
    sampling: SamplingParams,
    pred_sampling: SamplingParams,
    min_new_tokens: int,
    suppress_mask: jax.Array,
) -> Tuple[DecodeState, Tuple[jax.Array, jax.Array]]:
    """One frame: predictor loop -> frame tokens -> talker step -> next token.

    Mirrors the loop body of reference generate.py:149-199 / streaming.py:106-154.
    Returns (new_state, (frame [B,16] int32, valid [B] bool)).
    """
    B = state.token.shape[0]
    eos = talker_cfg.codec_eos_token_id
    max_seq = state.cache.max_seq

    eos_now = state.token == eos
    # Frame is emitted only if we were live at loop top (reference checks EOS
    # before the predictor, generate.py:150).
    valid = ~(state.done | eos_now)
    done = state.done | eos_now

    key, k_pred, k_tok = jax.random.split(state.key, 3)

    # --- code predictor (fused 15-codebook loop) ---
    tok_embed = talker_lib.embed_codec(talker_params, state.token)[:, None, :]  # [B,1,H]
    pred_input = jnp.concatenate([state.past_hidden, tok_embed], axis=1)  # [B,2,H]
    cbs = predictor_lib.predict_codebooks(pred_params, pred_cfg, pred_input, k_pred, pred_sampling)
    frame = jnp.concatenate([state.token[:, None], cbs], axis=1)  # [B,16]

    # --- talker input embedding: sum of 16 codec embeds + text hidden ---
    embeds = tok_embed[:, 0, :].astype(jnp.float32) + predictor_lib.embed_frame_sum(
        pred_params, cbs
    ).astype(jnp.float32)
    T = trailing_text.shape[1]
    idx = jnp.minimum(state.gen_step, T - 1)
    text_h = jnp.take_along_axis(trailing_text, idx[:, None, None], axis=1)[:, 0, :]
    text_h = jnp.where((state.gen_step < T)[:, None], text_h, tts_pad_embed[:, 0, :])
    embeds = (embeds + text_h.astype(jnp.float32)).astype(tok_embed.dtype)[:, None, :]

    # --- talker decode step ---
    s_ids = jnp.arange(max_seq)[None, :]
    length_mask = ((s_ids <= state.pos[:, None]) & (s_ids >= state.num_pads[:, None])).astype(
        jnp.int32
    )
    rope_pos = state.pos - state.num_pads
    hidden, cache = talker_lib.decode_step(
        talker_params, talker_cfg, embeds, state.pos, rope_pos, state.cache, length_mask
    )
    logits = talker_lib.codec_logits(talker_params, hidden[:, 0, :])  # [B,V] f32

    # --- sampling for next codebook-0 token ---
    seen = state.seen | jax.nn.one_hot(state.token, talker_cfg.vocab_size, dtype=jnp.bool_)
    logits = apply_repetition_penalty(logits, seen, sampling.repetition_penalty)
    n_frames = state.n_frames + valid.astype(jnp.int32)
    suppress_eos = n_frames < min_new_tokens  # [B]
    extra = suppress_eos[:, None] & (jnp.arange(talker_cfg.vocab_size) == eos)[None, :]
    next_token = sample_logits(k_tok, logits, sampling, suppress_mask=suppress_mask, suppress_extra=extra)

    # Length bound: reference emits the boundary frame then breaks before the
    # next talker step (generate.py:175-177) — mark done after emitting.
    done = done | (state.pos >= max_seq - 1)

    live = valid  # components updated only while live
    new_state = DecodeState(
        cache=cache,
        pos=jnp.where(live, state.pos + 1, state.pos),
        num_pads=state.num_pads,
        token=jnp.where(live, next_token, state.token),
        past_hidden=jnp.where(live[:, None, None], hidden, state.past_hidden),
        gen_step=jnp.where(live, state.gen_step + 1, state.gen_step),
        seen=jnp.where(live[:, None], seen, state.seen),
        key=key,
        done=done,
        n_frames=jnp.where(live, n_frames, state.n_frames),
    )
    return new_state, (frame, valid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "talker_cfg",
        "pred_cfg",
        "chunk_size",
        "sampling",
        "pred_sampling",
        "min_new_tokens",
    ),
    donate_argnames=("state",),
)
def decode_chunk(
    talker_params,
    pred_params,
    talker_cfg: TalkerConfig,
    pred_cfg: PredictorConfig,
    state: DecodeState,
    trailing_text: jax.Array,
    tts_pad_embed: jax.Array,
    chunk_size: int,
    sampling: SamplingParams,
    pred_sampling: SamplingParams,
    min_new_tokens: int,
) -> Tuple[DecodeState, jax.Array]:
    """Generate up to `chunk_size` frames fully on device.

    Returns (state, packed [chunk, B, num_code_groups+2] int32) where the
    last two columns are the valid flag and the done flag. Invalid rows (EOS
    reached) carry no information; the host trims them.
    """
    suppress = make_suppress_mask(talker_cfg.vocab_size, talker_cfg.codec_eos_token_id)

    # NOTE: no lax.cond early-exit around the frame body. A conditional whose
    # carry includes the 235MB KV cache forces branch-boundary copies and
    # breaks in-place cache aliasing — measured 3x the whole frame cost
    # (28 ms/frame vs 9 ms/frame on v5e for the 0.6B talker). Post-EOS frames
    # in the final partial chunk just compute masked-invalid garbage, which is
    # strictly cheaper.
    def body(st, _):
        return _decode_frame(
            talker_params,
            pred_params,
            talker_cfg,
            pred_cfg,
            st,
            trailing_text,
            tts_pad_embed,
            sampling,
            pred_sampling,
            min_new_tokens,
            suppress,
        )

    state, (frames, valid) = jax.lax.scan(body, state, None, length=chunk_size)
    # Pack frames + valid + done into ONE int32 array so the host needs a
    # single device->host fetch per chunk (transfers are round trips).
    done = jnp.broadcast_to(state.done[None, :], valid.shape)
    packed = jnp.concatenate(
        [frames, valid[:, :, None].astype(jnp.int32), done[:, :, None].astype(jnp.int32)],
        axis=-1,
    )
    return state, packed
