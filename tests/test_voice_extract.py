"""Voice extraction tests: mel frontend, x-vector encoder, RVQ codec encoder."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.models import voice_extract as vx


@pytest.fixture(scope="module")
def extractor(tiny_config):
    cfg = dataclasses.replace(tiny_config)
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    return vx.VoiceExtractor(params, cfg)


def _tone(sr=16000, secs=1.0, hz=220.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_mel_shape():
    mel = vx.mel_spectrogram(_tone(), 16000, n_mels=80)
    assert mel.shape[1] == 80
    assert 90 <= mel.shape[0] <= 110  # ~100 frames/s at hop 160


def test_xvector_properties(extractor):
    x1 = extractor.extract_xvector(_tone(hz=220), 16000)
    assert x1.shape == (2048,)
    # raw fc output (the public Qwen ECAPA has no output normalization)
    assert np.isfinite(x1).all()
    # deterministic
    x2 = extractor.extract_xvector(_tone(hz=220), 16000)
    np.testing.assert_allclose(x1, x2, rtol=1e-5)
    # different audio -> different embedding
    x3 = extractor.extract_xvector(_tone(hz=660), 16000)
    assert np.abs(x1 - x3).max() > 1e-4


def test_codes_shape_and_range(extractor, tiny_config):
    codes = extractor.extract_codes(_tone(secs=2.0), 16000)
    ccfg = tiny_config.codec
    expect_frames = round(2.0 * ccfg.frame_rate)
    assert abs(codes.shape[0] - expect_frames) <= 1
    assert codes.shape[1] == ccfg.num_quantizers
    assert codes.min() >= 0 and codes.max() < ccfg.codebook_size


def test_codes_deterministic(extractor):
    a = extractor.extract_codes(_tone(secs=0.5), 16000)
    b = extractor.extract_codes(_tone(secs=0.5), 16000)
    np.testing.assert_array_equal(a, b)
