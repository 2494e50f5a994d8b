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


def test_first_chunk_size_sample_exact(setup):
    """A smaller fused first chunk yields identical tokens AND identical
    total audio sample count/content vs the uniform-chunk run (same seed)."""
    params, cfg, (tie, tam, tth, tpe) = setup

    def run(fcs):
        frames_all, audio_all = [], []
        for frames, audio, timing in gen_lib.fast_generate_streaming_fused(
            params, cfg, tie, tam, tth, tpe, max_seq_len=64, max_new_tokens=12,
            chunk_size=4, seed=7, fuse_first_chunk=True, first_chunk_size=fcs,
        ):
            frames_all.append(frames)
            if audio is not None:
                audio_all.append(audio)
        return np.concatenate(frames_all), np.concatenate(audio_all)

    f_uniform, a_uniform = run(None)
    f_small, a_small = run(2)
    np.testing.assert_array_equal(f_uniform, f_small)
    assert a_uniform.shape == a_small.shape
    np.testing.assert_allclose(a_uniform, a_small, atol=1e-4)


def test_tth_bucket_static_single_executable_shape(setup):
    """Different text lengths land in ONE static trailing-text bucket (the
    executable signature axis that used to recompile per text-length)."""
    import os

    from faster_qwen3_tts_tpu.engine.generate import tth_bucket

    cap = int(os.environ.get("FQ3T_TTH_BUCKET", "256"))
    assert tth_bucket(1) == cap
    assert tth_bucket(cap) == cap
    assert tth_bucket(cap + 1) == 2 * cap  # pow2 fallback for overlong text

    params, cfg, _ = setup
    builder = PromptBuilder(params, cfg)
    tok = PromptTokenizer(ByteTokenizer())
    vcp = dict(ref_code=[None],
               ref_spk_embedding=[np.zeros(2048, np.float32)],
               x_vector_only_mode=[True], icl_mode=[False])
    shapes = set()
    for text in ("ab", "short but longer text"):  # both under the test bucket cap
        ids = tok.assistant_ids(text)
        tie, tam, tth, tpe = builder.build([ids], [None], vcp, ["English"], None, False)
        sess = gen_lib.GenerationSession(
            params, cfg, tie, tam, tth, tpe, 64,
            gen_lib.SamplingParams(), gen_lib.predictor_sampling(), 2, seed=0,
        )
        shapes.add(sess.tth.shape)
    assert len(shapes) == 1, shapes
