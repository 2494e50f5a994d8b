"""Device-side prompt assembly parity: build_device must be bit-identical
to the host build() + bucket padding on every supported streaming mode.

The device assembler (prompt._assemble_streaming_jit) is the TTFA lever
that removes the last pre-prefill device round trip (the request-text
hidden fetch) — but it re-implements the whole layout of build()
(reference model.py:583-805) with index arithmetic, so these tests pin the
two paths together exactly: any drift is a prompt-layout bug that makes
the model babble (reference tests/test_e2e_parity.py:22-30).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.engine import generate as gen_lib
from faster_qwen3_tts_tpu.prompt import PromptBuilder
from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer

MAX_SEQ = 512


@pytest.fixture(scope="module")
def setup(tiny_config):
    talker = dataclasses.replace(
        tiny_config.talker, spk_id={"ryan": 5}, spk_is_dialect={}
    )
    cfg = dataclasses.replace(
        tiny_config,
        talker=talker,
        tts_bos_token_id=300,
        tts_eos_token_id=301,
        tts_pad_token_id=302,
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    builder = PromptBuilder(params, cfg)
    tok = PromptTokenizer(ByteTokenizer())
    return cfg, builder, tok


def _xvec_vcp(h=2048, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        ref_code=[None],
        ref_spk_embedding=[rng.standard_normal(h).astype(np.float32)],
        x_vector_only_mode=[True],
        icl_mode=[False],
    )


def _icl_vcp(tok, n_frames=12, seed=0):
    rng = np.random.default_rng(seed)
    ref_code = rng.integers(0, 100, size=(n_frames, 16)).astype(np.int32)
    vcp = dict(
        ref_code=[ref_code],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[False],
        icl_mode=[True],
    )
    rid = tok.ref_ids("reference transcript text")
    return vcp, rid


def _compare(builder, input_ids, ref_ids, vcp, languages, speakers, instruct_ids):
    host = builder.build(
        input_ids, ref_ids, vcp, languages, speakers,
        non_streaming_mode=False, instruct_ids=instruct_ids,
    )
    dev = builder.build_device(
        input_ids, ref_ids, vcp, languages, speakers, instruct_ids, MAX_SEQ
    )
    assert dev is not None
    tie_h, mask_h, tth_h, tpe_h = host
    tie_d, mask_d, tth_d, tpe_d = dev

    pb = gen_lib.prefill_bucket(tie_h.shape[1], MAX_SEQ)
    tb = gen_lib.tth_bucket(tth_h.shape[1])
    assert tie_d.shape == (1, pb, tie_h.shape[2])
    assert tth_d.shape == (1, tb, tth_h.shape[2])

    tie_hb, mask_hb = gen_lib._pad_left(tie_h, mask_h, pb)
    tth_hb = gen_lib._pad_trailing(tth_h, tpe_h, tb)

    np.testing.assert_array_equal(np.asarray(mask_d), mask_hb)
    np.testing.assert_array_equal(np.asarray(tie_d), tie_hb)
    np.testing.assert_array_equal(np.asarray(tth_d), tth_hb)
    np.testing.assert_array_equal(np.asarray(tpe_d), np.asarray(tpe_h, np.float32))


def test_xvec_streaming_exact(setup):
    _, builder, tok = setup
    ids = tok.assistant_ids("hello world this is a test")
    _compare(builder, [ids], [None], _xvec_vcp(), ["English"], None, [None])


def test_xvec_instruct_exact(setup):
    _, builder, tok = setup
    ids = tok.assistant_ids("hello world")
    iid = tok.instruct_ids("speak slowly and softly")
    _compare(builder, [ids], [None], _xvec_vcp(), ["English"], None, [iid])


def test_custom_speaker_exact(setup):
    _, builder, tok = setup
    ids = tok.assistant_ids("custom voice speaker path")
    _compare(builder, [ids], [None], None, ["English"], ["ryan"], [None])


def test_language_auto_exact(setup):
    _, builder, tok = setup
    ids = tok.assistant_ids("auto language nothink prefix")
    _compare(builder, [ids], [None], _xvec_vcp(), ["Auto"], None, [None])


@pytest.mark.parametrize("n_frames", [3, 12, 40])
def test_icl_streaming_exact(setup, n_frames):
    _, builder, tok = setup
    ids = tok.assistant_ids("in context learning voice cloning sentence")
    vcp, rid = _icl_vcp(tok, n_frames=n_frames)
    _compare(builder, [ids], [rid], vcp, ["English"], None, [None])


def test_icl_instruct_exact(setup):
    _, builder, tok = setup
    ids = tok.assistant_ids("icl with an instruct turn")
    iid = tok.instruct_ids("whisper")
    vcp, rid = _icl_vcp(tok, n_frames=8, seed=3)
    _compare(builder, [ids], [rid], vcp, ["English"], None, [iid])


def test_single_token_text_exact(setup):
    """Shortest possible request: trailing is just the eos row."""
    _, builder, tok = setup
    ids = tok.assistant_ids("a")
    _compare(builder, [ids], [None], _xvec_vcp(), ["English"], None, [None])


def test_batch_returns_none(setup):
    _, builder, tok = setup
    ids = tok.assistant_ids("x")
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[None, None],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)] * 2,
        x_vector_only_mode=[True, True],
        icl_mode=[False, False],
    )
    out = builder.build_device(
        [ids, ids], [None, None], vcp, ["English"] * 2, None, [None, None], MAX_SEQ
    )
    assert out is None


def test_icl_device_block_cached(setup):
    """Second request for the same voice reuses the device-resident block."""
    _, builder, tok = setup
    ids = tok.assistant_ids("first request")
    vcp, rid = _icl_vcp(tok, n_frames=10, seed=7)
    builder.build_device([ids], [rid], vcp, ["English"], None, [None], MAX_SEQ)
    n = len(builder._ref_block_dev_cache)
    block0 = next(reversed(builder._ref_block_dev_cache.values()))[0]
    ids2 = tok.assistant_ids("second request same voice")
    builder.build_device([ids2], [rid], vcp, ["English"], None, [None], MAX_SEQ)
    assert len(builder._ref_block_dev_cache) == n
    assert next(reversed(builder._ref_block_dev_cache.values()))[0] is block0
