"""Independent parity decode path: per-step, growing-cache, eager fp32.

Plays the role of the reference's `parity_generate_streaming`
(reference streaming.py:191-359): a SECOND implementation of the whole
decode that shares only the weights, the config, and the sampling ops with
the fused engine (the reference's parity path likewise shares sampling.py).
Everything else — RMSNorm, RoPE, GQA attention, the KV bookkeeping, the
predictor loop, the talker-input embedding build — is re-derived here from
the model definition, deliberately NOT importing models/layers.py or
engine/core.py, so a bug injected into the fused path makes the
token-for-token comparison fail (reference streaming.py:213-216 notes the
intentional duplication).

Execution style is the opposite of the engine on purpose: one host-driven
Python step per frame, dynamically growing concatenated K/V lists, no jit,
float32 math. Slow, obvious, and shape-exact — the measuring stick.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PredictorConfig, Qwen3TTSConfig, TalkerConfig
from ..ops.sampling import SamplingParams, make_suppress_mask, sample_logits


def _rms(w, x, eps):
    xf = np.asarray(x, np.float32)
    var = np.mean(xf * xf, axis=-1, keepdims=True)
    return np.asarray(w, np.float32) * (xf / np.sqrt(var + eps))


def _rope(x, pos0, theta):
    """x: [S, H, D] -> rotated (HF cat layout). pos0: first position index."""
    S, H, D = x.shape
    half = D // 2
    inv = 1.0 / (theta ** (np.arange(half, dtype=np.float32) / half))
    ang = (pos0 + np.arange(S, dtype=np.float32))[:, None] * inv[None, :]  # [S, half]
    cos = np.cos(np.concatenate([ang, ang], -1))[:, None, :]
    sin = np.sin(np.concatenate([ang, ang], -1))[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    rot = np.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def _f32(a):
    # Dequantize int8/int4 weights so parity also covers quantized
    # deployments (the comparison is then quant-engine vs dequantized-eager).
    from ..ops.quant import dequantize

    return dequantize(a)


class _Stack:
    """One decoder stack (talker or predictor) evaluated step-by-step with a
    growing per-layer K/V list. Params come from the engine's stacked layout
    ([L, ...] leading axis) but are unstacked into per-layer numpy here."""

    def __init__(self, stacked, final_norm, num_heads, num_kv, head_dim, eps, theta,
                 sliding_window=None, layer_types=None):
        mats = {k: _f32(v) for k, v in stacked.items()}  # dequant BEFORE indexing
        L = mats["wq"].shape[0]
        self.layers = [{k: v[i] for k, v in mats.items()} for i in range(L)]
        self.final_norm = _f32(final_norm)
        self.nh, self.nkv, self.hd = num_heads, num_kv, head_dim
        self.eps, self.theta = eps, theta
        # Per-layer sliding windows (None = full attention), re-derived from
        # the config's layer_types independently of models/layers.py.
        if sliding_window is None:
            self.windows = [None] * L
        elif layer_types is None:
            self.windows = [sliding_window] * L
        else:
            self.windows = [
                sliding_window if t == "sliding_attention" else None for t in layer_types
            ]
        self.k: List[np.ndarray] = [None] * L  # per layer [S, nkv, hd]
        self.v: List[np.ndarray] = [None] * L
        self.pos = 0  # next rope position

    def forward(self, x: np.ndarray) -> np.ndarray:
        """x: [S, hidden] float32 (S>=1, appended to the sequence so far).
        Returns final-normed hidden states [S, hidden]."""
        S = x.shape[0]
        rep = self.nh // self.nkv
        for i, lp in enumerate(self.layers):
            h = _rms(lp["ln1"], x, self.eps)
            q = (h @ lp["wq"]).reshape(S, self.nh, self.hd)
            k = (h @ lp["wk"]).reshape(S, self.nkv, self.hd)
            v = (h @ lp["wv"]).reshape(S, self.nkv, self.hd)
            q = _rms(lp["q_norm"], q, self.eps)
            k = _rms(lp["k_norm"], k, self.eps)
            q = _rope(q, self.pos, self.theta)
            k = _rope(k, self.pos, self.theta)
            self.k[i] = k if self.k[i] is None else np.concatenate([self.k[i], k], 0)
            self.v[i] = v if self.v[i] is None else np.concatenate([self.v[i], v], 0)
            kk = np.repeat(self.k[i], rep, axis=1)  # [T, nh, hd]
            vv = np.repeat(self.v[i], rep, axis=1)
            T = kk.shape[0]
            scores = np.einsum("shd,thd->hst", q, kk) * (self.hd**-0.5)  # [nh,S,T]
            qpos = self.pos + np.arange(S)[:, None]
            causal = np.arange(T)[None, :] <= qpos  # [S, T]
            if self.windows[i] is not None:
                # HF sliding rule: kv allowed iff kv_pos > q_pos - window.
                causal = causal & (np.arange(T)[None, :] > qpos - self.windows[i])
            scores = np.where(causal[None], scores, -1e30)
            scores = scores - scores.max(-1, keepdims=True)
            probs = np.exp(scores)
            probs /= probs.sum(-1, keepdims=True)
            attn = np.einsum("hst,thd->shd", probs, vv).reshape(S, -1)
            x = x + attn @ lp["wo"]
            h = _rms(lp["ln2"], x, self.eps)
            gate = h @ lp["w_gate"]
            up = h @ lp["w_up"]
            silu = gate / (1.0 + np.exp(-gate))
            x = x + (silu * up) @ lp["w_down"]
        self.pos += S
        return _rms(self.final_norm, x, self.eps)


def _predict_codebooks_parity(
    pred_params, pcfg: PredictorConfig, past_hidden, tok_embed, key, sampling
) -> np.ndarray:
    """Independent 15-codebook loop (the PredictorGraph._full_loop role).
    past_hidden/tok_embed: [talker_hidden] float32. Returns [15] int32."""
    stack = _Stack(
        pred_params["layers"], pred_params["final_norm"],
        pcfg.num_attention_heads, pcfg.num_key_value_heads, pcfg.head_dim,
        pcfg.rms_norm_eps, pcfg.rope_theta,
        sliding_window=pcfg.sliding_window, layer_types=pcfg.layer_types,
    )
    w = _f32(pred_params["mtp_proj"]["w"])
    b = _f32(pred_params["mtp_proj"]["b"])
    embeds = _f32(pred_params["codec_embeds"])  # [15, vocab, talker_hidden]
    heads = _f32(pred_params["lm_heads"])  # [15, pred_hidden, vocab]

    x = np.stack([past_hidden, tok_embed]) @ w + b  # [2, pred_hidden]
    hs = stack.forward(x)
    toks = []
    logits = hs[-1] @ heads[0]
    tok = int(
        sample_logits(jax.random.fold_in(key, 0), jnp.asarray(logits[None]), sampling)[0]
    )
    toks.append(tok)
    for step in range(1, pcfg.num_codebooks):
        emb = embeds[step - 1, tok] @ w + b  # [pred_hidden]
        hd = stack.forward(emb[None])
        logits = hd[-1] @ heads[step]
        tok = int(
            sample_logits(jax.random.fold_in(key, step), jnp.asarray(logits[None]), sampling)[0]
        )
        toks.append(tok)
    return np.asarray(toks, np.int32)


def parity_generate_streaming(
    params,
    cfg: Qwen3TTSConfig,
    tie,
    attention_mask,
    trailing_text,
    tts_pad_embed,
    max_seq_len: int = 2048,
    max_new_tokens: int = 2048,
    min_new_tokens: int = 2,
    temperature: float = 0.9,
    top_k: int = 50,
    top_p: float = 1.0,
    do_sample: bool = True,
    repetition_penalty: float = 1.05,
    chunk_size: int = 12,
    first_chunk_size: Optional[int] = None,
    seed: Optional[int] = None,
    subtalker_dosample: Optional[bool] = None,
    subtalker_top_k: Optional[int] = None,
    subtalker_top_p: Optional[float] = None,
    subtalker_temperature: Optional[float] = None,
) -> Generator[Tuple[np.ndarray, Dict[str, Any]], None, None]:
    """Streaming parity decode, same protocol as fast_generate_streaming.

    Batch 1 only. The PRNG split discipline mirrors the engine exactly
    (start: split -> first token; per frame: split(key,3) -> predictor key,
    token key), so with identical fp32 weights the SAMPLED streams match the
    fused engine too, not just greedy ones.
    """
    from .generate import predictor_sampling  # default-frozen predictor params

    tcfg: TalkerConfig = cfg.talker
    pcfg: PredictorConfig = cfg.predictor
    sampling = SamplingParams(temperature, top_k, top_p, do_sample, repetition_penalty)
    pred_sampling = predictor_sampling(
        subtalker_dosample, subtalker_top_k, subtalker_top_p, subtalker_temperature
    )

    # --- unpadded prompt (no buckets in the parity path) ---
    mask = np.asarray(attention_mask)[0].astype(bool)
    x = _f32(tie)[0][mask]  # [P, H]
    P = x.shape[0]
    if P > max_seq_len:
        raise ValueError(f"prefill length {P} exceeds max_seq_len {max_seq_len}")
    tth = _f32(trailing_text)[0]
    tpe = _f32(tts_pad_embed)[0, 0]

    talker = _Stack(
        params["talker"]["layers"], params["talker"]["final_norm"],
        tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim,
        tcfg.rms_norm_eps, tcfg.rope_theta,
        sliding_window=tcfg.sliding_window, layer_types=tcfg.layer_types,
    )
    codec_embed = _f32(params["talker"]["codec_embed"])
    codec_head = _f32(params["talker"]["codec_head"])
    pred_embeds = _f32(params["predictor"]["codec_embeds"])

    eos = tcfg.codec_eos_token_id
    suppress = make_suppress_mask(tcfg.vocab_size, eos)
    eos_onehot = jnp.arange(tcfg.vocab_size) == eos

    if seed is None:
        seed = int(np.random.default_rng().integers(0, 2**31 - 1))
    key = jax.random.PRNGKey(seed)

    t0 = time.perf_counter()
    hs = talker.forward(x)
    past_hidden = hs[-1]
    logits = past_hidden @ codec_head
    key, sub = jax.random.split(key)
    extra = eos_onehot if min_new_tokens > 0 else None
    token = int(
        sample_logits(sub, jnp.asarray(logits[None]), sampling,
                      suppress_mask=suppress, suppress_extra=extra)[0]
    )
    prefill_ms = (time.perf_counter() - t0) * 1000.0

    seen = np.zeros(tcfg.vocab_size, bool)
    frames: List[np.ndarray] = []
    buffer: List[np.ndarray] = []
    total = 0
    chunk_index = 0
    t_chunk = time.perf_counter()

    def flush(is_final):
        nonlocal chunk_index, buffer, t_chunk
        if not buffer:
            return None
        out = np.stack(buffer)
        timing = {
            "chunk_index": chunk_index,
            "chunk_steps": int(out.shape[0]),
            "prefill_ms": prefill_ms if chunk_index == 0 else 0.0,
            "decode_ms": (time.perf_counter() - t_chunk) * 1000.0,
            "total_steps_so_far": total,
            "is_final": bool(is_final),
        }
        buffer = []
        chunk_index += 1
        t_chunk = time.perf_counter()
        return out, timing

    gen_step = 0
    while total < max_new_tokens:
        if token == eos:
            break
        key, k_pred, k_tok = jax.random.split(key, 3)
        tok_embed = codec_embed[token]
        cbs = _predict_codebooks_parity(
            params["predictor"], pcfg, past_hidden, tok_embed, k_pred, pred_sampling
        )
        frame = np.concatenate([[token], cbs]).astype(np.int32)
        buffer.append(frame)
        frames.append(frame)
        total += 1

        at_bound = talker.pos >= max_seq_len - 1
        if at_bound or total >= max_new_tokens:
            res = flush(True)
            if res:
                yield res
            return

        # next talker input: sum of 16 codec embeds + text hidden
        emb = tok_embed.copy()
        for i, t in enumerate(cbs):
            emb = emb + pred_embeds[i, t]
        text_h = tth[gen_step] if gen_step < tth.shape[0] else tpe
        gen_step += 1
        hd = talker.forward((emb + text_h)[None])
        past_hidden = hd[-1]
        logits = past_hidden @ codec_head

        seen[token] = True
        lg = np.where(
            seen,
            np.where(logits > 0, logits / repetition_penalty, logits * repetition_penalty),
            logits,
        )
        extra = eos_onehot if total < min_new_tokens else None
        token = int(
            sample_logits(k_tok, jnp.asarray(lg[None]), sampling,
                          suppress_mask=suppress, suppress_extra=extra)[0]
        )

        # A smaller first chunk mirrors the engine's TTFA path (generate.py
        # first_chunk_size): chunk 0 flushes early, later chunks at chunk_size.
        target = (first_chunk_size or chunk_size) if chunk_index == 0 else chunk_size
        if len(buffer) >= target:
            yield flush(False)

    res = flush(True)
    if res:
        yield res


def parity_generate(
    params, cfg: Qwen3TTSConfig, tie, attention_mask, trailing_text, tts_pad_embed,
    **kwargs,
) -> Tuple[Optional[np.ndarray], Dict[str, Any]]:
    """Non-streaming parity decode -> ([T,16] codes, timing)."""
    t0 = time.perf_counter()
    chunks = []
    prefill_ms = 0.0
    for frames, timing in parity_generate_streaming(
        params, cfg, tie, attention_mask, trailing_text, tts_pad_embed, **kwargs
    ):
        chunks.append(frames)
        if timing["chunk_index"] == 0:
            prefill_ms = timing["prefill_ms"]
    decode_s = time.perf_counter() - t0
    steps = int(sum(c.shape[0] for c in chunks))
    timing = {
        "prefill_ms": prefill_ms,
        "decode_s": decode_s,
        "steps": steps,
        "ms_per_step": (decode_s / steps * 1000.0) if steps else 0.0,
        "steps_per_s": (steps / decode_s) if decode_s > 0 else 0.0,
    }
    if not chunks:
        return None, timing
    return np.concatenate(chunks, axis=0), timing
