"""ICL streaming: ref-code prepended vocoding, phase transition, trimming.

Covers the reference's ICL streaming semantics (model.py:1085-1114: prepend
ref codes for early-chunk vocoding, trim the reference portion, switch to
windowed decode once enough generated context exists)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.model import FasterQwen3TTS
from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer


@pytest.fixture(scope="module")
def model(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    m = FasterQwen3TTS(params, cfg, PromptTokenizer(ByteTokenizer()), max_seq_len=160)
    m._warmed_up = True
    return m


@pytest.fixture(scope="module")
def icl_prompt():
    rng = np.random.default_rng(1)
    return {
        "ref_spk_embedding": [rng.standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [False],
        "icl_mode": [True],
        "ref_code": [rng.integers(0, 2048, (12, 16)).astype(np.int32)],
    }


def test_icl_streaming_chunks(model, icl_prompt):
    frames_target = 40  # crosses the 24-frame window threshold
    chunks = list(
        model.generate_voice_clone_streaming(
            "icl streaming text", "English", ref_text="reference words",
            voice_clone_prompt=icl_prompt, max_new_tokens=frames_target,
            chunk_size=8, do_sample=False, seed=3,
        )
    )
    assert len(chunks) == 5
    total = np.concatenate([c[0] for c in chunks])
    up = model.config.codec.total_upsample
    # reference portion trimmed: total generated audio ~ frames*up (not
    # (frames+ref)*up); allow a frame of slack for the proportional cut
    assert abs(total.size - frames_target * up) <= 2 * up
    assert chunks[-1][2]["is_final"]


def test_icl_streaming_matches_non_streaming_duration(model, icl_prompt):
    kwargs = dict(
        ref_text="reference words", voice_clone_prompt=icl_prompt,
        max_new_tokens=32, do_sample=False, seed=9,
    )
    audio, sr = model.generate_voice_clone("same icl text", "English", **kwargs)
    chunks = list(
        model.generate_voice_clone_streaming(
            "same icl text", "English", chunk_size=8, **kwargs
        )
    )
    streamed = np.concatenate([c[0] for c in chunks])
    up = model.config.codec.total_upsample
    assert abs(streamed.size - audio[0].size) <= 2 * up


# --------------------------------------------------------------------------
# Long-reference ICL: the fused first-chunk path (engine ref_codes window).
# With >= context_frames (24) reference frames, the reference tail IS the
# vocoder window from chunk 0, so every chunk — including the first — is one
# fused device program (the xvec TTFA path; VERDICT r3 next #2).
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def long_icl_prompt():
    rng = np.random.default_rng(7)
    return {
        "ref_spk_embedding": [rng.standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [False],
        "icl_mode": [True],
        "ref_code": [rng.integers(0, 2048, (30, 16)).astype(np.int32)],
    }


def _engine_stream(model, prompt, frames, chunk=8, first=4):
    from faster_qwen3_tts_tpu.engine import generate as gen_lib

    tie, tam, tth, tpe, ref_codes = model._prepare_generation(
        text="icl fused text", language="English", ref_text="reference words",
        voice_clone_prompt=prompt, non_streaming_mode=False,
    )
    return ref_codes, list(
        gen_lib.fast_generate_streaming_fused(
            model.params, model.config, tie, tam, tth, tpe,
            max_seq_len=model.max_seq_len, max_new_tokens=frames,
            do_sample=False, chunk_size=chunk, first_chunk_size=first,
            seed=5, ref_codes=ref_codes,
        )
    )


def test_icl_long_ref_every_chunk_fused(model, long_icl_prompt):
    """>=24 ref frames: NO chunk takes the host codec path (every yielded
    chunk carries device audio), and total audio is exactly frames*up."""
    FRAMES = 20
    ref_codes, chunks = _engine_stream(model, long_icl_prompt, FRAMES)
    assert ref_codes.shape[0] == 30
    assert all(a is not None for _f, a, _t in chunks)
    up = model.config.codec.total_upsample
    total = np.concatenate([a for _f, a, _t in chunks])
    frames = np.concatenate([f for f, _a, _t in chunks], axis=0)
    assert frames.shape[0] == FRAMES
    assert total.size == FRAMES * up


def test_icl_long_ref_window_sample_parity(model, long_icl_prompt):
    """Each fused ICL chunk's audio == host recompute of the same 24-frame
    window (ref tail + generated prefix) sliced window-locally: the fused
    path is sample-exact, not approximately trimmed."""
    import jax.numpy as jnp

    from faster_qwen3_tts_tpu.engine.fused_stream import codec_deficit
    from faster_qwen3_tts_tpu.models import codec as codec_lib

    FRAMES = 20
    ref_codes, chunks = _engine_stream(model, long_icl_prompt, FRAMES)
    up = model.config.codec.total_upsample
    D = codec_deficit(model.config.codec)
    gen = np.concatenate([f for f, _a, _t in chunks], axis=0)
    hist = np.concatenate([ref_codes, gen], axis=0)
    R = ref_codes.shape[0]
    pos = 0
    for f, a, _t in chunks:
        n = f.shape[0]
        window = hist[: R + pos + n][-(24 + n):]
        wav = np.asarray(
            codec_lib.decode_frames(
                model.params["codec"], model.config.codec, jnp.asarray(window[None])
            )
        )[0]
        want = wav[24 * up - D : (24 + n) * up - D]
        np.testing.assert_allclose(a, want, atol=1e-6, rtol=1e-5)
        pos += n


def test_icl_long_ref_tokens_match_non_streaming(model, long_icl_prompt):
    """The fused ICL vocode path must not perturb the token stream: greedy
    streaming tokens == greedy non-streaming tokens."""
    from faster_qwen3_tts_tpu.engine import generate as gen_lib

    FRAMES = 20
    _rc, chunks = _engine_stream(model, long_icl_prompt, FRAMES)
    stream_frames = np.concatenate([f for f, _a, _t in chunks], axis=0)

    tie, tam, tth, tpe, _ = model._prepare_generation(
        text="icl fused text", language="English", ref_text="reference words",
        voice_clone_prompt=long_icl_prompt, non_streaming_mode=False,
    )
    codes, _t = gen_lib.fast_generate(
        model.params, model.config, tie, tam, tth, tpe,
        max_seq_len=model.max_seq_len, max_new_tokens=FRAMES,
        do_sample=False, seed=5, device_chunk=8,
    )
    np.testing.assert_array_equal(stream_frames, codes)


def test_icl_long_ref_public_api_duration(model, long_icl_prompt):
    """Public API with a long reference: streaming (fused window emission)
    and non-streaming (prepend + proportional trim) agree on duration."""
    kwargs = dict(
        ref_text="reference words", voice_clone_prompt=long_icl_prompt,
        max_new_tokens=32, do_sample=False, seed=9,
    )
    audio, _sr = model.generate_voice_clone("long ref icl text", "English", **kwargs)
    chunks = list(
        model.generate_voice_clone_streaming(
            "long ref icl text", "English", chunk_size=8, **kwargs
        )
    )
    streamed = np.concatenate([c[0] for c in chunks])
    up = model.config.codec.total_upsample
    assert abs(streamed.size - audio[0].size) <= 2 * up


def test_icl_short_ref_handoff_sample_continuity(model, icl_prompt):
    """VERDICT r3 next #10: the short-ref host path's regime-2 -> regime-3
    handoff (ref-prepend accumulated decode -> fixed 24-frame window) must
    emit a stream that matches the non-streaming decode of the same tokens
    sample-for-sample within codec-bucketing tolerance — i.e. the trim and
    window arithmetic produce contiguous samples across the boundary, no
    gap/overlap/drift anywhere in the stream."""
    kwargs = dict(
        ref_text="reference words", voice_clone_prompt=icl_prompt,
        max_new_tokens=40, do_sample=False, seed=9,
    )
    chunks = list(
        model.generate_voice_clone_streaming("handoff text", "English",
                                             chunk_size=8, **kwargs)
    )
    streamed = np.concatenate([c[0] for c in chunks])
    audio, _sr = model.generate_voice_clone("handoff text", "English", **kwargs)
    full = audio[0]
    up = model.config.codec.total_upsample
    assert abs(streamed.size - full.size) <= up
    n = min(streamed.size, full.size)
    # measured headroom: max |err| ~7e-4 end to end (facade bucketing vs
    # exact-length decode); a misaligned handoff would be O(signal) ~1e-1
    np.testing.assert_allclose(streamed[:n], full[:n], atol=5e-3)
