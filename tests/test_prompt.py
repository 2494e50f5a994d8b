"""Prompt-assembly layout tests.

The prompt layout is the most parity-critical subsystem (reference
tests/test_e2e_parity.py:22-30: wrong alignment makes the model loop
forever). These tests pin the structural invariants of
PromptBuilder.build for each mode (reference model.py:583-805 semantics).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.prompt import PromptBuilder
from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer


@pytest.fixture(scope="module")
def setup(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    builder = PromptBuilder(params, cfg)
    tok = PromptTokenizer(ByteTokenizer())
    return cfg, builder, tok


def _expected_prefix_len(cfg, language: str, has_speaker: bool) -> int:
    """role(3) + [pads..., bos] + codec_prefix[:-1] length."""
    prefix = 3 if language.lower() == "auto" else 4
    k = prefix + (1 if has_speaker else 0) + 2  # + [codec_pad, codec_bos]
    return 3 + (k - 1)


def test_streaming_layout_lengths(setup):
    cfg, builder, tok = setup
    text = "hello world"
    ids = tok.assistant_ids(text)
    n_text = len(text.encode())
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[None],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[True],
        icl_mode=[False],
    )
    tie, mask, tth, tpe = builder.build(
        [ids], [None], vcp, ["English"], None, non_streaming_mode=False
    )
    # streaming: prefix + [first text tok + codec_bos]
    assert tie.shape[1] == _expected_prefix_len(cfg, "English", True) + 1
    assert mask.sum() == tie.shape[1]
    # trailing = remaining text tokens + eos
    assert tth.shape[1] == (n_text - 1) + 1
    assert tpe.shape == (1, 1, cfg.talker.hidden_size)


def test_nsm_layout_lengths(setup):
    cfg, builder, tok = setup
    text = "hello world"
    ids = tok.assistant_ids(text)
    n_text = len(text.encode())
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[None],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[True],
        icl_mode=[False],
    )
    tie, mask, tth, tpe = builder.build(
        [ids], [None], vcp, ["English"], None, non_streaming_mode=True
    )
    # nsm: prefix + (text+eos summed with codec_pad) + [tts_pad + codec_bos]
    assert tie.shape[1] == _expected_prefix_len(cfg, "English", True) + (n_text + 1) + 1
    # trailing collapses to tts_pad
    assert tth.shape[1] == 1
    np.testing.assert_allclose(tth[0, 0], np.asarray(tpe[0, 0]), rtol=1e-6)


def test_icl_layout_lengths(setup):
    cfg, builder, tok = setup
    text = "hello"
    ids = tok.assistant_ids(text)
    ref_ids = tok.ref_ids("reference words")
    rng = np.random.default_rng(0)
    Tc = 12
    vcp = dict(
        ref_code=[rng.integers(0, 2048, (Tc, 16)).astype(np.int32)],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[False],
        icl_mode=[True],
    )
    tie, mask, tth, tpe = builder.build(
        [ids], [ref_ids], vcp, ["English"], None, non_streaming_mode=False
    )
    # ICL streaming: prefix + [codec_bos + ref_text_0, frames...] (Tc + 1)
    assert tie.shape[1] == _expected_prefix_len(cfg, "English", True) + Tc + 1
    # trailing = full target text + eos (step-fed)
    assert tth.shape[1] == len(text.encode()) + 1


def test_auto_language_shorter_prefix(setup):
    cfg, builder, tok = setup
    ids = tok.assistant_ids("hi")
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[None],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[True],
        icl_mode=[False],
    )
    tie_en, _, _, _ = builder.build([ids], [None], vcp, ["English"], None, False)
    tie_auto, _, _, _ = builder.build([ids], [None], vcp, ["Auto"], None, False)
    # auto uses the 3-id nothink prefix vs 4-id language prefix
    assert tie_en.shape[1] == tie_auto.shape[1] + 1


def test_batch_left_padding(setup):
    cfg, builder, tok = setup
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[None, None],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)] * 2,
        x_vector_only_mode=[True, True],
        icl_mode=[False, False],
    )
    ids_a = tok.assistant_ids("hi")
    ids_b = tok.assistant_ids("a much longer sentence here")
    # nsm=True: prompt length grows with text, so the short item gets padded
    tie, mask, tth, tpe = builder.build(
        [ids_a, ids_b], [None, None], vcp, ["English", "English"], None, True
    )
    assert tie.shape[0] == 2
    # shorter item is LEFT-padded (reference model.py:771-787)
    pads_a = tie.shape[1] - int(mask[0].sum())
    assert pads_a > 0
    assert mask[0, :pads_a].sum() == 0 and mask[0, pads_a:].all()
    np.testing.assert_allclose(tie[0, :pads_a], 0.0)
    # streaming mode: trailing padded with the pad embedding (model.py:789-803)
    tie2, mask2, tth2, tpe2 = builder.build(
        [ids_a, ids_b], [None, None], vcp, ["English", "English"], None, False
    )
    t_a_len = len("hi".encode()) - 1 + 1
    np.testing.assert_allclose(tth2[0, t_a_len], np.asarray(tpe2[0, 0]), rtol=1e-6)


def test_instruct_prepends(setup):
    cfg, builder, tok = setup
    ids = tok.assistant_ids("hi")
    instr = tok.instruct_ids("speak warmly")
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[None],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[True],
        icl_mode=[False],
    )
    tie0, _, _, _ = builder.build([ids], [None], vcp, ["English"], None, False)
    tie1, _, _, _ = builder.build(
        [ids], [None], vcp, ["English"], None, False, instruct_ids=[instr]
    )
    # instruct adds exactly its token count, leaving the suffix identical
    # (reference tests/test_e2e_parity.py:1022-1053)
    extra = instr.shape[1]
    assert tie1.shape[1] == tie0.shape[1] + extra
    np.testing.assert_allclose(tie1[0, extra:], tie0[0], rtol=1e-5, atol=1e-6)


def test_icl_ref_prompt_cache_skips_device_calls(tiny_config, monkeypatch):
    """Repeat requests for one ICL voice must hit the per-voice cache: the
    second build issues exactly ONE text-hidden device call (the request
    text) and ZERO frame-embed calls, and returns bit-identical outputs —
    two device round trips (~60 ms through the tunnel) off the ICL TTFA
    path, the analog of the reference's voice-prompt cache
    (reference model.py:47,424-427)."""
    import faster_qwen3_tts_tpu.prompt as prompt_mod

    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    builder = PromptBuilder(params, cfg)
    tok = PromptTokenizer(ByteTokenizer())

    calls = {"text": 0, "frame": 0}
    orig_text, orig_frame = prompt_mod._text_hidden_jit, prompt_mod._frame_embeds_jit

    def count_text(*a, **kw):
        calls["text"] += 1
        return orig_text(*a, **kw)

    def count_frame(*a, **kw):
        calls["frame"] += 1
        return orig_frame(*a, **kw)

    monkeypatch.setattr(prompt_mod, "_text_hidden_jit", count_text)
    monkeypatch.setattr(prompt_mod, "_frame_embeds_jit", count_frame)

    ids = tok.assistant_ids("hello")
    ref_ids = tok.ref_ids("reference words")
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[rng.integers(0, 2048, (12, 16)).astype(np.int32)],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[False],
        icl_mode=[True],
    )
    build = lambda t: builder.build(
        [tok.assistant_ids(t)], [ref_ids], vcp, ["English"], None,
        non_streaming_mode=False,
    )
    first = build("hello")
    calls_after_first = dict(calls)
    assert calls["frame"] == 1

    second = build("hello")
    # one text-hidden call for the request text; ref hiddens + frames cached
    assert calls["text"] == calls_after_first["text"] + 1
    assert calls["frame"] == calls_after_first["frame"]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)

    # a DIFFERENT voice (new ref codes) must miss the cache
    vcp2 = dict(vcp, ref_code=[rng.integers(0, 2048, (12, 16)).astype(np.int32)])
    builder.build([ids], [ref_ids], vcp2, ["English"], None, non_streaming_mode=False)
    assert calls["frame"] == calls_after_first["frame"] + 1
