"""Codec decoder tests: shape law, causality, chunked==full consistency.

The chunked/full consistency test is the structural guarantee behind the
reference's streaming sliding-window decode (reference model.py:1048-1056,
README 25-frame left-context scheme): with causal convs, decoding a window
with k frames of left context reproduces the full decode for the new frames.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu.models import codec as codec_lib


@pytest.fixture(scope="module")
def codec(tiny_config):
    cfg = tiny_config.codec
    params = codec_lib.init_params(0, cfg, dtype=jnp.float32)
    return cfg, params


def _codes(rng, cfg, T):
    return jax.random.randint(rng, (1, T, cfg.num_quantizers), 0, cfg.codebook_size)


def test_output_shape_law(codec, rng):
    cfg, params = codec
    up_ratio = 1
    for r in cfg.upsampling_ratios:
        up_ratio *= r
    # decoder blocks: L -> (L-1)*r each; compute expected length
    for T in (4, 10, 30):
        wav = codec_lib.decode_frames_jit(params, cfg, _codes(rng, cfg, T))
        L = T * up_ratio
        for r in cfg.upsample_rates:
            L = (L - 1) * r
        assert wav.shape == (1, L)
        assert np.abs(np.asarray(wav)).max() <= 1.0


def test_causality_prefix_stable(codec, rng):
    """decode(codes[:k]) must equal the prefix of decode(codes) away from the
    tail (the transposed-conv right-trim only affects the last frames)."""
    cfg, params = codec
    codes = _codes(rng, cfg, 24)
    full = np.asarray(codec_lib.decode_frames_jit(params, cfg, codes))
    part = np.asarray(codec_lib.decode_frames_jit(params, cfg, codes[:, :12]))
    # Compare the region fully determined by the first ~8 frames.
    n = 8 * cfg.total_upsample
    np.testing.assert_allclose(part[:, :n], full[:, :n], rtol=2e-4, atol=2e-5)


def test_chunked_matches_full(codec, rng):
    """Each chunk's samples must equal the full decode at that chunk's true
    sample offset. (Each window's decode is a few hundred samples short at its
    tail from the trans-conv trim, so segments are compared at their own
    offsets — this per-window deficit is exactly why the reference calibrates
    samples_per_frame empirically, model.py:1108-1114.)"""
    cfg, params = codec
    T, chunk, ctx = 40, 16, 8
    up = cfg.total_upsample
    codes = _codes(rng, cfg, T)
    full = np.asarray(codec_lib.decode_frames_jit(params, cfg, codes))
    start = 0
    while start < T:
        end = min(start + chunk, T)
        c = ctx if start - ctx > 0 else start
        seg = np.asarray(codec_lib.decode_frames_jit(params, cfg, codes[:, start - c : end]))
        seg = seg[:, c * up :]
        ref = full[:, start * up : start * up + seg.shape[1]]
        # The causal trans-conv trim gives each stage ~1 input frame of
        # lookahead, so the last ~2 frames of a window legitimately differ
        # from the full decode (the upstream chunked decoder has the same
        # property). Compare the stable region only.
        n = min(seg.shape[1], ref.shape[1]) - (2 * up if end < T else 0)
        assert n > 0
        np.testing.assert_allclose(seg[:, :n], ref[:, :n], rtol=2e-4, atol=1e-4)
        start = end


def test_pre_transformer_sliding_window(codec, rng):
    """Frames farther back than the sliding window must not influence the
    current frame's pre-transformer output (bounded receptive field)."""
    cfg, params = codec
    T = cfg.sliding_window + 6
    codes = _codes(rng, cfg, T)
    altered = codes.at[:, 0, :].set((codes[:, 0, :] + 7) % cfg.codebook_size)
    h1 = codec_lib.decode_frames_jit(params, cfg, codes)
    h2 = codec_lib.decode_frames_jit(params, cfg, altered)
    # last frame's samples: beyond attention window AND conv receptive field
    tail = np.asarray(h1[:, -cfg.total_upsample // 2 :])
    tail2 = np.asarray(h2[:, -cfg.total_upsample // 2 :])
    np.testing.assert_allclose(tail, tail2, rtol=1e-4, atol=1e-6)
