"""Host-pump edge cases: max_new_tokens trimming, bucket errors, subtalker
sampling overrides (reference generate.py:32-36 subtalker_* args)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.engine import generate as gen_lib
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
    rng = np.random.default_rng(0)
    vcp = dict(
        ref_code=[None],
        ref_spk_embedding=[rng.standard_normal(2048).astype(np.float32)],
        x_vector_only_mode=[True],
        icl_mode=[False],
    )
    ids = tok.assistant_ids("pump test text")
    tie, tam, tth, tpe = builder.build([ids], [None], vcp, ["English"], None, False)
    return params, cfg, (tie, tam, tth, tpe)


def test_max_new_tokens_exact_trim(setup):
    """Odd max_new_tokens not divisible by the device chunk must be honored
    exactly (overshoot trimmed on host, no remainder recompile)."""
    params, cfg, (tie, tam, tth, tpe) = setup
    codes, timing = gen_lib.fast_generate(
        params, cfg, tie, tam, tth, tpe, max_seq_len=64, max_new_tokens=11,
        do_sample=False, seed=0, device_chunk=4,
    )
    assert codes.shape == (11, 16)
    assert timing["steps"] == 11
    assert timing["decode_s"] > 0 and timing["prefill_ms"] > 0


def test_streaming_final_chunk_partial(setup):
    params, cfg, (tie, tam, tth, tpe) = setup
    chunks = list(
        gen_lib.fast_generate_streaming(
            params, cfg, tie, tam, tth, tpe, max_seq_len=64, max_new_tokens=10,
            do_sample=False, chunk_size=4, seed=0,
        )
    )
    sizes = [c[0].shape[0] for c in chunks]
    assert sizes == [4, 4, 2]
    assert chunks[-1][1]["is_final"] and not chunks[0][1]["is_final"]


def test_prefill_too_long_raises(setup):
    params, cfg, (tie, tam, tth, tpe) = setup
    big = np.zeros((1, 80, tie.shape[2]), np.float32)
    with pytest.raises(ValueError, match="exceeds max_seq_len"):
        gen_lib.fast_generate(
            params, cfg, big, np.ones((1, 80), np.int32), tth, tpe,
            max_seq_len=64, max_new_tokens=4,
        )


def test_subtalker_override_changes_codebooks(setup):
    """Greedy talker + sampled predictor (subtalker_dosample=True) must differ
    from fully-greedy in codebooks 1..15 but not necessarily codebook 0."""
    params, cfg, (tie, tam, tth, tpe) = setup
    greedy, _ = gen_lib.fast_generate(
        params, cfg, tie, tam, tth, tpe, max_seq_len=64, max_new_tokens=6,
        do_sample=False, seed=3, device_chunk=6,
    )
    mixed, _ = gen_lib.fast_generate(
        params, cfg, tie, tam, tth, tpe, max_seq_len=64, max_new_tokens=6,
        do_sample=False, subtalker_dosample=True, subtalker_temperature=5.0,
        seed=3, device_chunk=6,
    )
    # high-temperature sampled predictor output diverges
    assert (np.asarray(greedy[:, 1:]) != np.asarray(mixed[:, 1:])).any()
