"""Fused streaming vs plain (parity-mode) streaming equivalence.

The role of the reference's static-vs-dynamic parity layer
(tests/test_e2e_parity.py Layer 1): two independent implementations of the
same stream — the fused decode+vocode path and the plain chunked path with
host vocoding — must produce identical greedy token streams, and their audio
must be sample-aligned within the documented tolerance.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.model import FasterQwen3TTS
from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer

FRAMES = 40  # enough to cross the 25-frame context threshold into fused phase 2


@pytest.fixture(scope="module")
def model(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    m = FasterQwen3TTS(params, cfg, PromptTokenizer(ByteTokenizer()), max_seq_len=128)
    m._warmed_up = True
    return m


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.default_rng(0)
    return {
        "ref_spk_embedding": [rng.standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [True],
        "icl_mode": [False],
        "ref_code": [None],
    }


def _collect(model, prompt, parity: bool, monkeypatch=None):
    frames, audio = [], []
    from faster_qwen3_tts_tpu.engine import generate as gen_lib

    tie, tam, tth, tpe, _rc = model._prepare_generation(
        text="stream parity text", language="English", voice_clone_prompt=prompt,
        non_streaming_mode=False,
    )
    if parity:
        stream = (
            (f, None, t)
            for f, t in gen_lib.fast_generate_streaming(
                model.params, model.config, tie, tam, tth, tpe,
                max_seq_len=model.max_seq_len, max_new_tokens=FRAMES,
                do_sample=False, chunk_size=8, seed=5,
            )
        )
    else:
        stream = gen_lib.fast_generate_streaming_fused(
            model.params, model.config, tie, tam, tth, tpe,
            max_seq_len=model.max_seq_len, max_new_tokens=FRAMES,
            do_sample=False, chunk_size=8, seed=5,
        )
    for f, a, timing in stream:
        frames.append(f)
        audio.append(a)
    return np.concatenate(frames, axis=0), audio


def test_fused_tokens_match_plain(model, prompt):
    fused_frames, fused_audio = _collect(model, prompt, parity=False)
    plain_frames, plain_audio = _collect(model, prompt, parity=True)
    np.testing.assert_array_equal(fused_frames, plain_frames)
    assert fused_frames.shape == (FRAMES, 16)
    # the plain pump yields tokens only (the model layer host-vocodes); the
    # fused pump (default-on) yields device audio once past the context window
    assert all(a is None for a in plain_audio)
    assert any(a is not None for a in fused_audio)


def test_device_vocode_matches_host(model, prompt, monkeypatch):
    """Device-vocoded chunks (default) must match the host windowed vocode
    sample-for-sample (same codes, same math)."""
    monkeypatch.setenv("FQ3T_FUSED_VOCODE", "0")
    host_chunks = list(
        model.generate_voice_clone_streaming(
            "stream parity text", "English", voice_clone_prompt=prompt,
            max_new_tokens=FRAMES, chunk_size=8, do_sample=False, seed=5,
        )
    )
    monkeypatch.setenv("FQ3T_FUSED_VOCODE", "1")
    dev_chunks = list(
        model.generate_voice_clone_streaming(
            "stream parity text", "English", voice_clone_prompt=prompt,
            max_new_tokens=FRAMES, chunk_size=8, do_sample=False, seed=5,
        )
    )
    host = np.concatenate([c[0] for c in host_chunks])
    dev = np.concatenate([c[0] for c in dev_chunks])
    n = min(host.size, dev.size)
    assert abs(host.size - dev.size) <= 1920
    np.testing.assert_allclose(dev[:n], host[:n], atol=2e-4, rtol=1e-3)


def test_fused_audio_contiguous_with_host_vocode(model, prompt):
    """Full API streaming: fused-path audio must line up with the host-vocoded
    full decode: total sample count within one frame of T*up - D."""
    chunks = list(
        model.generate_voice_clone_streaming(
            "stream parity text", "English", voice_clone_prompt=prompt,
            max_new_tokens=FRAMES, chunk_size=8, do_sample=False, seed=5,
        )
    )
    streamed = np.concatenate([c[0] for c in chunks])
    up = model.config.codec.total_upsample
    from faster_qwen3_tts_tpu.engine.fused_stream import codec_deficit

    D = codec_deficit(model.config.codec)
    expected = FRAMES * up - D
    assert abs(streamed.size - expected) <= up
    # non-streaming decode of the same greedy tokens
    audio, sr = model.generate_voice_clone(
        "stream parity text", "English", voice_clone_prompt=prompt,
        max_new_tokens=FRAMES, do_sample=False, seed=5,
    )
    # same token stream -> same total duration (within one frame)
    assert abs(audio[0].size - streamed.size) <= up
    # and the overlapping early samples must match closely (both decode the
    # same codes with full left context there)
    n = 10 * up
    np.testing.assert_allclose(streamed[:n], audio[0][:n], atol=5e-4, rtol=1e-3)


def test_fused_first_chunk_and_big_chunk_transition(model, prompt):
    """fuse_first_chunk=True with chunk_size >= context window: the device
    hist carry from the ctx=0 first chunk is stale (1 frame) — the dispatcher
    must rebuild it before the first steady-state fused chunk. Tokens must
    match the plain pump exactly and audio must cover the stream."""
    from faster_qwen3_tts_tpu.engine import generate as gen_lib
    from faster_qwen3_tts_tpu.engine.fused_stream import codec_deficit

    tie, tam, tth, tpe, _rc = model._prepare_generation(
        text="stream parity text", language="English", voice_clone_prompt=prompt,
        non_streaming_mode=False,
    )
    kw = dict(max_seq_len=model.max_seq_len, max_new_tokens=48,
              do_sample=False, chunk_size=24, seed=5)
    fused = list(gen_lib.fast_generate_streaming_fused(
        model.params, model.config, tie, tam, tth, tpe,
        fuse_first_chunk=True, context_frames=24, **kw))
    plain = list(gen_lib.fast_generate_streaming(
        model.params, model.config, tie, tam, tth, tpe, **kw))
    f_frames = np.concatenate([f for f, a, t in fused], axis=0)
    p_frames = np.concatenate([f for f, t in plain], axis=0)
    np.testing.assert_array_equal(f_frames, p_frames)
    # every fused chunk carries device audio (chunk0 via ctx=0, rest via ctx=24)
    assert all(a is not None for f, a, t in fused)
    up = model.config.codec.total_upsample
    D = codec_deficit(model.config.codec)
    total = sum(len(a) for f, a, t in fused if a is not None)
    # chunk0 emits 24*up - D; steady chunks emit 24*up each
    assert total == 48 * up - D


def test_fused_transport_has_no_denormals(model, prompt):
    """The fused single-fetch array must carry token/flag metadata as exact
    f32 VALUES, never int32->f32 bitcasts: small int bit patterns are f32
    denormals, and TPU compute units flush denormals to zero (silently
    zeroing every token and valid flag on hardware while CPU tests pass).
    """
    import numpy as np

    from faster_qwen3_tts_tpu.engine import generate as gen_lib
    from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

    tie, tam, tth, tpe, _rc = model._prepare_generation(
        "denormal transport check", "English", voice_clone_prompt=prompt, xvec_only=True
    )
    sess = gen_lib.GenerationSession(
        model.params, model.config, tie, tam, tth, tpe, model.max_seq_len,
        SamplingParams(), gen_lib.predictor_sampling(), 2, seed=0,
    )
    sess.prefill()
    flat = np.asarray(sess.decode_chunk_fused_async(4, 0))
    up = model.config.codec.total_upsample
    ncg = model.config.talker.num_code_groups
    meta = flat[4 * up : -1]
    # every metadata value is an integer-valued NORMAL float (or exact zero)
    assert np.all(meta == np.round(meta))
    nonzero = meta[meta != 0]
    assert nonzero.size  # tokens + valid flags present
    assert np.all(np.abs(nonzero) >= 1.0)
    # and the round trip recovers plausible codec tokens
    audio, frames, done, emitted = gen_lib.GenerationSession.materialize_fused(
        sess, flat, 4
    )
    assert frames.shape[0] == 4 and frames.shape[1] == ncg
    assert frames.min() >= 0
