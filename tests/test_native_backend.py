"""NativeQwen3TTS voice-reference cache + cached-ref kwargs tests.

Mirrors the reference's GGML adapter test coverage
(tests/test_ggml_backend.py:206-298): extract-once memory+disk caching,
cross-instance disk reuse, atomic file triplets, and cached-reference input
validation.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.native_backend import NativeQwen3TTS
from faster_qwen3_tts_tpu.utils.audio import write_wav
from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer


def _make(tiny_config, tmp_path):
    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    m = NativeQwen3TTS(
        params, cfg, PromptTokenizer(ByteTokenizer()), max_seq_len=128,
        voice_ref_cache_dir=tmp_path / "refs",
    )
    m._warmed_up = True
    return m


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    p = tmp_path_factory.mktemp("audio") / "ref.wav"
    t = np.arange(16000) / 16000
    write_wav(p, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 16000)
    return p


def test_extract_once_then_cached(tiny_config, tmp_path, ref_wav):
    model = _make(tiny_config, tmp_path)
    xv1, codes1, prof1 = model.extract_voice_ref(ref_wav)
    assert prof1["cache"] == "miss"
    assert xv1.shape == (2048,) and codes1 is not None
    xv2, codes2, prof2 = model.extract_voice_ref(ref_wav)
    assert prof2["cache"] == "hit"
    np.testing.assert_array_equal(codes1, codes2)
    # triplet on disk (reference ggml_backend.py:403-471)
    files = sorted(p.suffix for p in (tmp_path / "refs").iterdir())
    assert files == [".json", ".rvq", ".spk"]


def test_cross_instance_disk_reuse(tiny_config, tmp_path, ref_wav):
    m1 = _make(tiny_config, tmp_path)
    _, _, p1 = m1.extract_voice_ref(ref_wav, xvec_only=True)
    assert p1["cache"] == "miss"
    m2 = _make(tiny_config, tmp_path)  # fresh instance, same disk dir
    _, _, p2 = m2.extract_voice_ref(ref_wav, xvec_only=True)
    assert p2["cache"] == "hit"


def test_xvec_only_key_differs(tiny_config, tmp_path, ref_wav):
    model = _make(tiny_config, tmp_path)
    _, codes_icl, _ = model.extract_voice_ref(ref_wav, xvec_only=False)
    _, codes_xv, _ = model.extract_voice_ref(ref_wav, xvec_only=True)
    assert codes_icl is not None and codes_xv is None


def test_cached_ref_kwargs_validation(tiny_config, tmp_path, ref_wav):
    model = _make(tiny_config, tmp_path)
    xv = np.zeros(2048, np.float32)
    with pytest.raises(ValueError, match="only one of"):
        model._validate_cached_ref_args(str(ref_wav), None, None, xv, None)
    with pytest.raises(ValueError, match="only one of"):
        model._validate_cached_ref_args(None, None, "x.rvq", None, np.zeros((3, 16)))
    # ICL cached ref without ref_text
    with pytest.raises(ValueError, match="ref_text"):
        model._resolve_cached_reference(
            None, "", False, True, ref_spk_emb=xv, ref_codes=np.zeros((3, 16), np.int32)
        )


def test_generate_with_spk_file(tiny_config, tmp_path, ref_wav):
    """ref_spk file path -> generation without touching the encoder."""
    model = _make(tiny_config, tmp_path)
    spk_path = tmp_path / "v.spk"
    np.random.default_rng(0).standard_normal(2048).astype(np.float32).tofile(spk_path)
    audio, sr = model.generate_voice_clone(
        "cached speaker", "English", ref_spk=spk_path, xvec_only=True,
        max_new_tokens=8, do_sample=False, seed=0,
    )
    assert audio[0].size > 500
