"""Talker prompt assembly: text/codec/speaker streams -> prefill embeddings.

This owns what the reference re-implements locally from upstream
(`_build_talker_inputs_local`, reference model.py:583-805, plus the upstream
`generate_icl_prompt` / `generate_speaker_prompt` it calls) — the single most
parity-critical piece of the system: a wrong prompt layout makes the model
babble or loop (reference tests/test_e2e_parity.py:22-30).

Layout summary (one batch item; every position is a talker-width vector,
text-lane and codec-lane contributions are SUMMED position-wise):

    [role hiddens (3)]
    [tts_pad x k, tts_bos] + [codec think/language prefix, (speaker), codec_pad]
    then ONE of:
      non-ICL streaming : [first_text_tok + codec_bos]           (trailing = text[1:]+eos)
      non-ICL nsm       : [(text+eos) + codec_pad ..., tts_pad + codec_bos]
                                                                  (trailing = tts_pad)
      ICL streaming     : [codec_bos + ref_text_0,
                           ref_frame_i + ref_text_{i+1}/tts_pad ...]
                                                                  (trailing = text+eos)
      ICL nsm           : ICL streaming ++ [(text+eos) + codec_pad ...,
                           tts_pad + codec_bos]                   (trailing = tts_pad)

TPU-first implementation note: embedding gathers run as a handful of
bucket-shaped jitted helpers (bounded compile count); the variable-length
concatenation happens on host in numpy, and the finished prompt crosses to
the device exactly once per request (a few hundred KB).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Qwen3TTSConfig
from .models import predictor as predictor_lib
from .models import talker as talker_lib


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=())
def _text_hidden_jit(tparams, ids):
    return talker_lib.text_hidden(tparams, ids)


@functools.partial(jax.jit, static_argnames=())
def _codec_embed_jit(tparams, ids):
    return talker_lib.embed_codec(tparams, ids)


@functools.partial(jax.jit, static_argnames=())
def _frame_embeds_jit(tparams, pparams, codes):
    """codes [1, T, 16] -> per-frame summed embeddings [1, T, H]
    (talker codebook-0 embed + 15 predictor codebook embeds — the same sum the
    decode loop builds each step, reference generate.py:162-166)."""
    cb0 = talker_lib.embed_codec(tparams, codes[:, :, 0])  # [B, T, H]
    B, T = codes.shape[:2]
    rest = predictor_lib.embed_frame_sum(pparams, codes.reshape(B * T, -1)[:, 1:])
    return cb0 + rest.reshape(cb0.shape).astype(cb0.dtype)


@functools.partial(jax.jit, static_argnames=())
def _speaker_proj_jit(tparams, xvec):
    return talker_lib.speaker_project(tparams, xvec)


@functools.partial(jax.jit, static_argnames=("pb", "tb", "icl"))
def _assemble_streaming_jit(
    tparams,
    ids,  # [1, Lb] int32: [instruct ids | request ids | 0-pad]
    i_len,  # () int32: instruct token count (0 when absent)
    l_len,  # () int32: request token count (role+text+suffix)
    k,  # () int32: codec control block rows
    icl_len,  # () int32: ICL block rows (Tc+1; 0 when non-ICL)
    codec_emb,  # [8, H] f32: padded codec control block
    specials,  # [3, H] f32: (tts_pad, tts_bos, tts_eos) projected embeds
    icl_block,  # [Rb, H] f32 per-voice summed ICL block, or None (icl=False)
    pb: int,  # static: prefill bucket
    tb: int,  # static: trailing-text bucket
    icl: bool,  # static: ICL layout
):
    """Device-side streaming prompt assembly: the whole prompt build — the
    request-text embedding gather plus the positional composition that
    `PromptBuilder.build` does in host numpy — as ONE jitted program whose
    outputs never visit the host.

    This removes the last pre-prefill device round trip from the TTFA path
    (the request-text hidden fetch, ~30 ms through the tunnel) AND the
    tie/tth re-upload (~2 MB/request): prefill consumes these arrays
    device-side (engine/generate.py GenerationSession passes exact-bucket
    arrays through untouched). Positions are computed with index arithmetic
    + clamped gathers (no dynamic_update_slice), so every segment length is
    a traced scalar and ONE executable per (text bucket, prefill bucket,
    trailing bucket, icl) shape class serves all requests.

    Layout mirrors build() exactly (reference model.py:583-805):
      [pad... | instruct | role(3) | text_lane+codec | last-row/ICL-block]
    right-aligned at `pb`, trailing text hiddens [text[1:], eos, pad...] at
    `tb`. Additions happen in f32 in the same order as the host path, so the
    result is bit-identical to build() + _pad_left/_pad_trailing.

    Returns (tie [1,pb,H] param-dtype, mask [1,pb] int32, tth [1,tb,H]
    param-dtype).
    """
    full = talker_lib.text_hidden(tparams, ids).astype(jnp.float32)[0]  # [Lb, H]
    Lb = full.shape[0]
    pad_e, bos_e, eos_e = specials[0], specials[1], specials[2]

    # item rows: instruct(I) + role(3) + codec block(k-1) + [ICL block
    # (icl_len) | the single first-token row (1)]
    P = i_len + k + ((2 + icl_len) if icl else 3)
    j = jnp.arange(pb, dtype=jnp.int32)
    jp = j - (pb - P)  # position within the item; negative = left padding

    # segment 1: instruct + role header — a straight copy of full[0:i_len+3]
    seg1 = (jp >= 0) & (jp < i_len + 3)
    part1 = jnp.take(full, jnp.clip(jp, 0, Lb - 1), axis=0)

    # segment 2: codec control block with the (pad...pad, bos) text lane
    m = jp - (i_len + 3)
    seg2 = (m >= 0) & (m < k - 1)
    lane2 = jnp.where((m == k - 2)[:, None], bos_e[None, :], pad_e[None, :])
    part2 = lane2 + jnp.take(codec_emb, jnp.clip(m, 0, codec_emb.shape[0] - 1), axis=0)

    if icl:
        # segment 3: the per-voice ICL block (ref text lane + bos/frame lane)
        r = jp - (i_len + k + 2)
        seg3 = (r >= 0) & (r < icl_len)
        part3 = jnp.take(icl_block, jnp.clip(r, 0, icl_block.shape[0] - 1), axis=0)
    else:
        # segment 3: the single (first text token + codec_bos) row
        seg3 = jp == (i_len + k + 2)
        first_tok = jnp.take(full, jnp.clip(i_len + 3, 0, Lb - 1)[None], axis=0)
        last_codec = jnp.take(
            codec_emb, jnp.clip(k - 1, 0, codec_emb.shape[0] - 1)[None], axis=0
        )
        part3 = first_tok + last_codec  # [1, H], broadcast over positions

    tie = (
        jnp.where(seg1[:, None], part1, 0.0)
        + jnp.where(seg2[:, None], part2, 0.0)
        + jnp.where(seg3[:, None], part3, 0.0)
    )
    mask = (j >= (pb - P)).astype(jnp.int32)

    # trailing text hiddens: [text tokens fed per step, eos, pad...]
    # non-ICL streaming feeds text[1:] (the first token sits in the prompt);
    # ICL feeds the full text (reference model.py:699-766).
    start = i_len + (3 if icl else 4)
    n_text = l_len - (8 if icl else 9)
    t = jnp.arange(tb, dtype=jnp.int32)
    src = jnp.take(full, jnp.clip(start + t, 0, Lb - 1), axis=0)
    tth = jnp.where(
        (t < n_text)[:, None],
        src,
        jnp.where((t == n_text)[:, None], eos_e[None, :], pad_e[None, :]),
    )

    dt = tparams["codec_embed"].dtype
    # The barrier keeps the lane sums in REAL f32 before the one rounding to
    # the param dtype: without it, XLA:TPU's bf16-propagation pass demotes
    # the adds feeding a bf16 output to bf16 arithmetic, and the assembled
    # prompt drifts 1-2 bf16 ulps from the host build (measured on v5e —
    # enough to decorrelate sampled streams at a fixed seed).
    tie, tth = jax.lax.optimization_barrier((tie, tth))
    return tie[None].astype(dt), mask[None], tth[None].astype(dt)


@functools.partial(jax.jit, static_argnames=("rb",))
def _icl_block_jit(
    tparams,
    pparams,
    rid,  # [1, RLb] int32: ref text ids, already the [3:-2] slice, 0-padded
    rlen,  # () int32: real ref-text token count
    codes,  # [1, Cb, 16] int32: ref codec frames, 0-padded
    tc_len,  # () int32: real ref frame count Tc
    consts,  # [2, H] f32: (codec_bos embed, tts_pad embed)
    rb: int,  # static: ICL block bucket (>= Tc+1)
):
    """Per-voice ICL prompt block [rb, H] f32, computed entirely on device:
    row m = (ref_text_hidden[m] if m < min(rlen, Tc+1) else tts_pad)
          + (codec_bos if m == 0 else frame_embed[m-1]).

    This is the device-resident analog of the host _ref_prompt_cache pair —
    the lane sum is precomputed once per voice so request-time assembly is a
    single gather (reference model.py:699-737 ICL block semantics)."""
    rth = talker_lib.text_hidden(tparams, rid).astype(jnp.float32)[0]  # [RLb, H]
    cb0 = talker_lib.embed_codec(tparams, codes[:, :, 0])  # [1, Cb, H]
    B, T = codes.shape[:2]
    rest = predictor_lib.embed_frame_sum(pparams, codes.reshape(B * T, -1)[:, 1:])
    fe = (cb0 + rest.reshape(cb0.shape).astype(cb0.dtype)).astype(jnp.float32)[0]  # [Cb, H]
    bos_e, pad_e = consts[0], consts[1]

    m = jnp.arange(rb, dtype=jnp.int32)
    n = jnp.minimum(rlen, tc_len + 1)
    lane = jnp.where(
        (m < n)[:, None],
        jnp.take(rth, jnp.clip(m, 0, rth.shape[0] - 1), axis=0),
        pad_e[None, :],
    )
    codec_lane = jnp.where(
        (m == 0)[:, None],
        bos_e[None, :],
        jnp.take(fe, jnp.clip(m - 1, 0, fe.shape[0] - 1), axis=0),
    )
    return lane + codec_lane


class PromptBuilder:
    """Builds (talker_input_embeds, attention_mask, trailing_text_hiddens,
    tts_pad_embed) for a batch of requests."""

    def __init__(self, params: Dict[str, Any], cfg: Qwen3TTSConfig):
        self.params = params
        self.cfg = cfg
        self._specials: Optional[Dict[str, np.ndarray]] = None
        # Host-side memoization: every jitted gather is a device round trip
        # (expensive through the TPU tunnel), so constant pieces — codec
        # control-id embeds, role-header hiddens, projected x-vectors — are
        # fetched once and reused across requests.
        self._codec_embed_cache: Dict[tuple, np.ndarray] = {}
        self._role_cache: Dict[tuple, np.ndarray] = {}
        self._xvec_cache: Dict[bytes, np.ndarray] = {}
        # Per-voice ICL constants (ref-text hiddens + ref-frame embeds): the
        # reference serves repeat requests for one voice from its voice-
        # prompt cache (reference model.py:47,424-427); here the analogous
        # win is skipping TWO device round trips per request (~60 ms through
        # the tunnel) — the single remaining fetch is the request text.
        # LRU-bounded: a 90-frame entry is ~0.7 MB host f32.
        from collections import OrderedDict

        self._ref_prompt_cache: "OrderedDict[tuple, Tuple[np.ndarray, np.ndarray]]" = OrderedDict()
        self._ref_prompt_cache_max = 16
        # Device-side assembly constants (build_device): committed jnp arrays
        # reused across requests so nothing but the token ids and a few
        # scalars crosses host->device per request.
        self._specials_device = None  # [3, H] f32 (pad, bos, eos)
        # LRU-bounded like the sibling caches: the key includes the speaker
        # embed, so a server cloning many voices would otherwise pin a new
        # padded [8, H] device buffer per voice forever (ADVICE r4 #1).
        self._codec_emb_device: "OrderedDict[bytes, Any]" = OrderedDict()
        self._ref_block_dev_cache: "OrderedDict[tuple, Tuple[Any, int]]" = OrderedDict()

    # -- bucketed host<->device helpers --------------------------------------

    def _text_hidden(self, ids: np.ndarray) -> np.ndarray:
        """ids [1, L] -> hiddens [L, H] (numpy f32)."""
        L = ids.shape[1]
        if L == 0:
            return np.zeros((0, self._h()), np.float32)
        b = _bucket(L)
        padded = np.zeros((1, b), np.int32)
        padded[:, :L] = ids
        from .engine import aot

        out = aot.call("text_hidden", _text_hidden_jit,
                       tparams=self.params["talker"], ids=jnp.asarray(padded))
        # fetch-then-slice: eager device indexing would dispatch a tiny
        # one-off program per call (slow/wedge-prone on remote backends)
        return np.asarray(out, np.float32)[0, :L]

    def _codec_embed(self, ids: Sequence[int]) -> np.ndarray:
        key = tuple(int(i) for i in np.asarray(ids).reshape(-1))
        hit = self._codec_embed_cache.get(key)
        if hit is not None:
            return hit
        ids = np.asarray(ids, np.int32).reshape(1, -1)
        L = ids.shape[1]
        b = _bucket(L, lo=8)
        padded = np.zeros((1, b), np.int32)
        padded[:, :L] = ids
        from .engine import aot

        out = aot.call("codec_embed", _codec_embed_jit,
                       tparams=self.params["talker"], ids=jnp.asarray(padded))
        result = np.asarray(out, np.float32)[0, :L]
        self._codec_embed_cache[key] = result
        return result

    def _frame_embeds(self, codes: np.ndarray) -> np.ndarray:
        """codes [T, 16] -> [T, H]."""
        T = codes.shape[0]
        b = _bucket(T)
        padded = np.zeros((1, b, codes.shape[1]), np.int32)
        padded[0, :T] = codes
        from .engine import aot

        out = aot.call("frame_embeds", _frame_embeds_jit,
                       tparams=self.params["talker"],
                       pparams=self.params["predictor"], codes=jnp.asarray(padded))
        return np.asarray(out, np.float32)[0, :T]

    def _h(self) -> int:
        return self.cfg.talker.hidden_size

    def specials(self) -> Dict[str, np.ndarray]:
        """Projected tts_bos/eos/pad text embeddings, cached (reference
        model.py:647-655)."""
        if self._specials is None:
            c = self.cfg
            ids = np.array([[c.tts_bos_token_id, c.tts_eos_token_id, c.tts_pad_token_id]], np.int32)
            h = self._text_hidden(ids)
            self._specials = {"bos": h[0], "eos": h[1], "pad": h[2]}
        return self._specials

    def speaker_embed_from_xvector(self, xvec: np.ndarray) -> np.ndarray:
        """2048-d x-vector -> talker hidden (generate_speaker_prompt analog)."""
        key = np.ascontiguousarray(xvec, np.float32).tobytes()
        hit = self._xvec_cache.get(key)
        if hit is not None:
            return hit
        from .engine import aot

        out = aot.call("speaker_proj", _speaker_proj_jit,
                       tparams=self.params["talker"],
                       xvec=jnp.asarray(xvec.reshape(1, -1), jnp.float32))
        result = np.asarray(out, np.float32)[0]
        self._xvec_cache[key] = result
        return result

    def _item_codec_block(
        self,
        index: int,
        language: Optional[str],
        speaker: Optional[str],
        voice_clone_prompt: Optional[Dict[str, Any]],
    ) -> np.ndarray:
        """One item's codec control block [k, H] f32: language think prefix,
        optional speaker embedding, then (codec_pad, codec_bos) — steps 2+3 of
        the prompt layout (reference model.py:614-669). Every piece is
        host-cached after first use; no device round trips on repeat voices."""
        tc = self.cfg.talker

        # speaker embedding resolution (reference model.py:614-629)
        speaker_embed = None
        if voice_clone_prompt is not None:
            if voice_clone_prompt["x_vector_only_mode"][index] or voice_clone_prompt["icl_mode"][index]:
                xv = voice_clone_prompt["ref_spk_embedding"][index]
                speaker_embed = (
                    np.asarray(xv, np.float32)
                    if np.asarray(xv).ndim == 1 and np.asarray(xv).shape[0] == self._h()
                    else self.speaker_embed_from_xvector(np.asarray(xv, np.float32))
                )
        elif speaker:
            key = speaker.lower()
            if key not in tc.spk_id:
                raise NotImplementedError(f"Speaker {speaker} not implemented")
            speaker_embed = self._codec_embed([tc.spk_id[key]])[0]

        # language -> codec think prefix (reference model.py:631-669)
        assert language is not None
        lang_key = language.lower()
        if lang_key == "auto":
            language_id = None
        else:
            if lang_key not in tc.codec_language_id:
                raise NotImplementedError(f"Language {language} not implemented")
            language_id = tc.codec_language_id[lang_key]
        if (
            lang_key in ("chinese", "auto")
            and speaker not in ("", None)
            and tc.spk_is_dialect.get(speaker.lower())
        ):
            language_id = tc.codec_language_id[tc.spk_is_dialect[speaker.lower()]]

        if language_id is None:
            prefix_ids = [tc.codec_nothink_id, tc.codec_think_bos_id, tc.codec_think_eos_id]
        else:
            prefix_ids = [
                tc.codec_think_id,
                tc.codec_think_bos_id,
                language_id,
                tc.codec_think_eos_id,
            ]

        codec_seq = [self._codec_embed(prefix_ids)]
        if speaker_embed is not None:
            codec_seq.append(speaker_embed.reshape(1, -1))
        codec_seq.append(self._codec_embed([tc.codec_pad_id, tc.codec_bos_id]))
        return np.concatenate(codec_seq, axis=0)  # [k, H]

    # -- main assembly --------------------------------------------------------

    def build(
        self,
        input_ids: List[np.ndarray],
        ref_ids: List[Optional[np.ndarray]],
        voice_clone_prompt: Optional[Dict[str, Any]],
        languages: List[str],
        speakers: Optional[List[Optional[str]]],
        non_streaming_mode: bool,
        instruct_ids: Optional[List[Optional[np.ndarray]]] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Returns (tie [B,P,H], attn_mask [B,P], tth [B,T,H], tpe [1,1,H]),
        numpy f32, left-padded across the batch (reference model.py:771-805)."""
        tc = self.cfg.talker
        sp = self.specials()
        tts_bos, tts_eos, tts_pad = sp["bos"], sp["eos"], sp["pad"]

        if speakers is None:
            speakers = [None] * len(input_ids)
        if instruct_ids is None:
            instruct_ids = [None] * len(input_ids)

        embeds_per_item: List[np.ndarray] = []
        trailing_per_item: List[np.ndarray] = []

        for index, (ids, language, speaker) in enumerate(zip(input_ids, languages, speakers)):
            parts: List[np.ndarray] = []

            # 1) optional instruction turn (reference model.py:601-606)
            iid = instruct_ids[index]
            if iid is not None:
                parts.append(self._text_hidden(np.asarray(iid).reshape(1, -1)))

            # 2+3) speaker + language -> the codec control block
            codec_emb = self._item_codec_block(index, language, speaker, voice_clone_prompt)

            # One device round trip embeds the whole id sequence; role header,
            # body text, and step-fed slices all come from it.
            full_h = self._text_hidden(ids)

            # 4) role header + (pad...bos) + codec stream (reference model.py:686-697)
            role = full_h[:3]
            k = codec_emb.shape[0]
            text_lane = np.concatenate(
                [np.tile(tts_pad[None, :], (k - 2, 1)), tts_bos[None, :]], axis=0
            )
            # instruct turn (if any) goes FIRST (reference model.py:601-606)
            item = parts + [role, text_lane + codec_emb[:-1]]

            # 5) branch: ICL vs plain (reference model.py:699-766)
            icl_mode = (
                voice_clone_prompt is not None
                and voice_clone_prompt.get("ref_code") is not None
                and voice_clone_prompt["icl_mode"][index]
                and voice_clone_prompt["ref_code"][index] is not None
            )
            text_hiddens = full_h[3:-5]

            if icl_mode:
                rid = np.asarray(ref_ids[index])
                ref_code = np.asarray(voice_clone_prompt["ref_code"][index], np.int32)
                ck = (rid.tobytes(), rid.shape, ref_code.tobytes(), ref_code.shape)
                cached = self._ref_prompt_cache.get(ck)
                if cached is None:
                    ref_text_hiddens = self._text_hidden(rid[:, 3:-2])
                    frame_embs = self._frame_embeds(ref_code)  # [Tc, H]
                    self._ref_prompt_cache[ck] = (ref_text_hiddens, frame_embs)
                    if len(self._ref_prompt_cache) > self._ref_prompt_cache_max:
                        self._ref_prompt_cache.popitem(last=False)
                else:
                    self._ref_prompt_cache.move_to_end(ck)
                    ref_text_hiddens, frame_embs = cached
                Tc = frame_embs.shape[0]
                # text lane across the ICL block: ref text then tts_pad
                lane = np.tile(tts_pad[None, :], (Tc + 1, 1))
                n = min(ref_text_hiddens.shape[0], Tc + 1)
                lane[:n] = ref_text_hiddens[:n]
                codec_lane = np.concatenate(
                    [self._codec_embed([tc.codec_bos_id]), frame_embs], axis=0
                )
                item.append(lane + codec_lane)
                if non_streaming_mode:
                    pad_codec = self._codec_embed([tc.codec_pad_id])[0]
                    block = np.concatenate([text_hiddens, tts_eos[None, :]], axis=0) + pad_codec
                    tail = (tts_pad + self._codec_embed([tc.codec_bos_id])[0])[None, :]
                    item.extend([block, tail])
                    trailing = tts_pad[None, :]
                else:
                    trailing = np.concatenate([text_hiddens, tts_eos[None, :]], axis=0)
            else:
                first_tok_hidden = full_h[3:4]
                if non_streaming_mode:
                    pad_codec = self._codec_embed([tc.codec_pad_id])[0]
                    block = np.concatenate([text_hiddens, tts_eos[None, :]], axis=0) + pad_codec
                    tail = (tts_pad + self._codec_embed([tc.codec_bos_id])[0])[None, :]
                    item.extend([block, tail])
                    trailing = tts_pad[None, :]
                else:
                    item.append(first_tok_hidden + codec_emb[-1:])
                    # step-fed text: tokens after the first + eos (model.py:758-766)
                    trailing = np.concatenate([full_h[4:-5], tts_eos[None, :]], axis=0)

            embeds_per_item.append(np.concatenate(item, axis=0))
            trailing_per_item.append(trailing)

        # 6) left-pad batching (reference model.py:771-787)
        H = self._h()
        max_len = max(e.shape[0] for e in embeds_per_item)
        B = len(embeds_per_item)
        tie = np.zeros((B, max_len, H), np.float32)
        mask = np.zeros((B, max_len), np.int32)
        for b, e in enumerate(embeds_per_item):
            tie[b, max_len - e.shape[0] :] = e
            mask[b, max_len - e.shape[0] :] = 1

        # 7) trailing hiddens padded with the pad embedding (model.py:789-803)
        max_t = max(t.shape[0] for t in trailing_per_item)
        tth = np.tile(tts_pad[None, None, :], (B, max_t, 1))
        for b, t in enumerate(trailing_per_item):
            tth[b, : t.shape[0]] = t

        tpe = tts_pad[None, None, :]
        return tie, mask, tth, tpe

    # -- device-side assembly (streaming modes) -------------------------------

    def _specials_dev(self):
        if self._specials_device is None:
            sp = self.specials()
            self._specials_device = jnp.asarray(
                np.stack([sp["pad"], sp["bos"], sp["eos"]]), jnp.float32
            )
        return self._specials_device

    def _codec_block_dev(self, codec_emb: np.ndarray):
        """Commit a padded [8, H] codec control block once per distinct
        (language, speaker/voice) combination."""
        key = codec_emb.tobytes()
        hit = self._codec_emb_device.get(key)
        if hit is None:
            padded = np.zeros((8, self._h()), np.float32)
            padded[: codec_emb.shape[0]] = codec_emb
            hit = jnp.asarray(padded)
            self._codec_emb_device[key] = hit
            if len(self._codec_emb_device) > self._ref_prompt_cache_max:
                self._codec_emb_device.popitem(last=False)
        else:
            self._codec_emb_device.move_to_end(key)
        return hit

    def _icl_block_device(self, rid: np.ndarray, ref_code: np.ndarray):
        """Per-voice device-resident ICL block [(Rb, H) jnp f32, icl_len].
        Computed once per voice with ZERO host fetches (the host analog
        _ref_prompt_cache needs two); LRU-bounded like the host cache."""
        from .engine import aot

        rid = np.asarray(rid)
        ref_code = np.asarray(ref_code, np.int32)
        ck = (rid.tobytes(), rid.shape, ref_code.tobytes(), ref_code.shape)
        cached = self._ref_block_dev_cache.get(ck)
        if cached is not None:
            self._ref_block_dev_cache.move_to_end(ck)
            return cached
        tc = self.cfg.talker
        Tc = ref_code.shape[0]
        icl_len = Tc + 1
        rb = _bucket(icl_len)
        rid_part = rid[:, 3:-2]
        rlen = rid_part.shape[1]
        rid_padded = np.zeros((1, _bucket(max(rlen, 1))), np.int32)
        rid_padded[0, :rlen] = rid_part[0]
        codes = np.zeros((1, _bucket(max(Tc, 1)), ref_code.shape[1]), np.int32)
        codes[0, :Tc] = ref_code
        consts = np.stack(
            [self._codec_embed([tc.codec_bos_id])[0], self.specials()["pad"]]
        )
        block = aot.call(
            "icl_block",
            _icl_block_jit,
            tparams=self.params["talker"],
            pparams=self.params["predictor"],
            rid=jnp.asarray(rid_padded),
            rlen=jnp.asarray(rlen, jnp.int32),
            codes=jnp.asarray(codes),
            tc_len=jnp.asarray(Tc, jnp.int32),
            consts=jnp.asarray(consts, jnp.float32),
            rb=rb,
        )
        entry = (block, icl_len)
        self._ref_block_dev_cache[ck] = entry
        if len(self._ref_block_dev_cache) > self._ref_prompt_cache_max:
            self._ref_block_dev_cache.popitem(last=False)
        return entry

    def build_device(
        self,
        input_ids: List[np.ndarray],
        ref_ids: List[Optional[np.ndarray]],
        voice_clone_prompt: Optional[Dict[str, Any]],
        languages: List[str],
        speakers: Optional[List[Optional[str]]],
        instruct_ids: Optional[List[Optional[np.ndarray]]],
        max_seq_len: int,
    ):
        """Streaming-mode prompt assembly fully on device.

        Returns (tie, mask, tth, tpe) where tie/mask/tth are committed device
        arrays at the exact prefill/trailing buckets GenerationSession expects
        (so it passes them through with no pad, cast, or upload), and tpe is
        the host pad-embed constant. Returns None when the configuration
        needs the host path (batch>1 — the batch scheduler re-pads in numpy).

        Semantics are pinned to build() by tests/test_prompt_device.py:
        bit-identical outputs on every supported mode.
        """
        if len(input_ids) != 1:
            return None
        from .engine import aot
        from .engine import generate as gen_lib

        sp = self.specials()
        ids = np.asarray(input_ids[0]).reshape(1, -1)
        L = ids.shape[1]
        iid = instruct_ids[0] if instruct_ids else None
        iarr = (
            np.asarray(iid, np.int32).reshape(1, -1)
            if iid is not None
            else np.zeros((1, 0), np.int32)
        )
        I = iarr.shape[1]

        speaker = speakers[0] if speakers else None
        codec_emb = self._item_codec_block(0, languages[0], speaker, voice_clone_prompt)
        k = codec_emb.shape[0]

        icl_mode = (
            voice_clone_prompt is not None
            and voice_clone_prompt.get("ref_code") is not None
            and voice_clone_prompt["icl_mode"][0]
            and voice_clone_prompt["ref_code"][0] is not None
        )
        if icl_mode:
            icl_block, icl_len = self._icl_block_device(
                ref_ids[0], voice_clone_prompt["ref_code"][0]
            )
        else:
            icl_block, icl_len = None, 0

        # One static ids bucket for every text up to the cap (the tth_bucket
        # rationale, generate.py:71-83): all typical requests share ONE
        # assembly executable per (pb, tb, icl) class; longer texts fall back
        # to pow2 classes.
        lb = max(256, _bucket(I + L))
        combined = np.zeros((1, lb), np.int32)
        combined[0, :I] = iarr[0]
        combined[0, I : I + L] = ids[0]

        P = I + k + ((2 + icl_len) if icl_mode else 3)
        pb = gen_lib.prefill_bucket(P, max_seq_len)
        n_text = L - (8 if icl_mode else 9)
        tb = gen_lib.tth_bucket(n_text + 1)

        tie, mask, tth = aot.call(
            "assemble_prompt",
            _assemble_streaming_jit,
            tparams=self.params["talker"],
            ids=jnp.asarray(combined),
            i_len=jnp.asarray(I, jnp.int32),
            l_len=jnp.asarray(L, jnp.int32),
            k=jnp.asarray(k, jnp.int32),
            icl_len=jnp.asarray(icl_len, jnp.int32),
            codec_emb=self._codec_block_dev(codec_emb),
            specials=self._specials_dev(),
            icl_block=icl_block,
            pb=pb,
            tb=tb,
            icl=icl_mode,
        )
        tpe = sp["pad"][None, None, :]
        return tie, mask, tth, tpe
