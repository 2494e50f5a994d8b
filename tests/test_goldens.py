"""Golden regression artifacts from the seeded tiny model.

Pins (a) the greedy token stream of the fused engine and (b) the codec
decoder's waveform for a fixed code sequence, as committed .npz files under
samples/goldens/. Any optimization round that changes numerics now fails
here first (the reference's committed-sample strategy, SURVEY §4 Tier C /
reference benchmarks/generate_parity_samples.py).

Regenerate with: FQ3T_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.engine import generate as gen_lib
from faster_qwen3_tts_tpu.models import codec as codec_lib

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "samples", "goldens")
REGEN = os.environ.get("FQ3T_REGEN_GOLDENS") == "1"


def _golden(name, compute, exact=True, atol=0.0):
    path = os.path.join(GOLDEN_DIR, name)
    got = compute()
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **got)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
    ref = np.load(path)
    for k in ref.files:
        if exact and got[k].dtype.kind in "iu":
            np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
        else:
            np.testing.assert_allclose(got[k], ref[k], atol=atol, rtol=0, err_msg=k)


def test_golden_greedy_tokens(tiny_config):
    def compute():
        params = weights_lib.init_all(tiny_config, seed=5, dtype=jnp.float32)
        H = tiny_config.talker.hidden_size
        rng = np.random.default_rng(11)
        tie = (rng.standard_normal((1, 20, H)) * 0.05).astype(np.float32)
        mask = np.ones((1, 20), np.int32)
        tth = (rng.standard_normal((1, 6, H)) * 0.05).astype(np.float32)
        tpe = (rng.standard_normal((1, 1, H)) * 0.05).astype(np.float32)
        codes, _ = gen_lib.fast_generate(
            params, tiny_config, tie, mask, tth, tpe,
            max_seq_len=64, max_new_tokens=24, seed=3, device_chunk=8,
            do_sample=False, subtalker_dosample=False,
        )
        return {"codes": codes.astype(np.int32)}

    _golden("tiny_greedy_tokens.npz", compute)


def test_golden_sampled_tokens(tiny_config):
    """Sampled stream with a fixed PRNG seed — pins the sampling ops and the
    key-split discipline, not just the argmax path."""

    def compute():
        params = weights_lib.init_all(tiny_config, seed=5, dtype=jnp.float32)
        H = tiny_config.talker.hidden_size
        rng = np.random.default_rng(12)
        tie = (rng.standard_normal((1, 16, H)) * 0.05).astype(np.float32)
        mask = np.ones((1, 16), np.int32)
        tth = (rng.standard_normal((1, 4, H)) * 0.05).astype(np.float32)
        tpe = (rng.standard_normal((1, 1, H)) * 0.05).astype(np.float32)
        codes, _ = gen_lib.fast_generate(
            params, tiny_config, tie, mask, tth, tpe,
            max_seq_len=64, max_new_tokens=16, seed=7, device_chunk=8,
        )
        return {"codes": codes.astype(np.int32)}

    _golden("tiny_sampled_tokens.npz", compute)


def test_golden_codec_waveform(tiny_config):
    def compute():
        params = codec_lib.init_params(2000, tiny_config.codec, dtype=jnp.float32)
        rng = np.random.default_rng(4)
        codes = rng.integers(
            0, tiny_config.codec.codebook_size, size=(1, 12, 16), dtype=np.int32
        )
        wav = codec_lib.decode_frames(params, tiny_config.codec, jnp.asarray(codes))
        return {"wav": np.asarray(wav, np.float32)}

    _golden("tiny_codec_wav.npz", compute, exact=False, atol=2e-5)
