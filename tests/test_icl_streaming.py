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
