"""Batched (B>1) decode: per-stream equivalence with B=1 runs.

The reference is batch-size-1 everywhere (graphs captured at batch 1,
SURVEY §2.3); this engine keeps a leading batch dim so multi-stream serving
is a shape change. These tests pin that batching is CLEAN: each stream in a
left-padded batch produces exactly the tokens of its own solo run, and EOS
on one stream never perturbs the others.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.engine import core, generate as gen_lib
from faster_qwen3_tts_tpu.ops.sampling import SamplingParams


@pytest.fixture(scope="module")
def params(tiny_config):
    return weights_lib.init_all(tiny_config, seed=9, dtype=jnp.float32)


def _prompts(cfg, lengths, bucket):
    """Left-padded batch of random prompts with the given real lengths."""
    H = cfg.talker.hidden_size
    rng = np.random.default_rng(3)
    B = len(lengths)
    tie = np.zeros((B, bucket, H), np.float32)
    mask = np.zeros((B, bucket), np.int32)
    singles = []
    for i, L in enumerate(lengths):
        x = (rng.standard_normal((L, H)) * 0.05).astype(np.float32)
        tie[i, bucket - L :] = x
        mask[i, bucket - L :] = 1
        singles.append(x)
    return tie, mask, singles


def _decode(params, cfg, tie, mask, chunk, n_chunks, max_seq=64):
    sampling = SamplingParams(do_sample=False)
    B, P, H = tie.shape
    tth = np.zeros((B, 4, H), np.float32)
    tpe = np.zeros((B, 1, H), np.float32)
    state, _ = core.start_state(
        params["talker"], cfg.talker, jnp.asarray(tie), jnp.asarray(mask),
        jax.random.PRNGKey(0), max_seq, sampling, 2,
    )
    outs = []
    for _ in range(n_chunks):
        state, packed = core.decode_chunk(
            params["talker"], params["predictor"],
            cfg.talker, cfg.predictor, state,
            jnp.asarray(tth), jnp.asarray(tpe), chunk, sampling, sampling, 2,
        )
        outs.append(packed)
    frames, valid, done = gen_lib.GenerationSession.materialize_batch(
        jnp.concatenate(outs, axis=0)
    )
    return frames, valid, done, state


def test_batched_greedy_matches_solo(tiny_config, params):
    cfg = tiny_config
    bucket = 24
    tie, mask, _ = _prompts(cfg, [10, 17], bucket)
    bf, bv, bd, _ = _decode(params, cfg, tie, mask, chunk=4, n_chunks=3)
    for i in range(2):
        sf, sv, sd, _ = _decode(params, cfg, tie[i : i + 1], mask[i : i + 1], 4, 3)
        np.testing.assert_array_equal(bf[:, i], sf[:, 0])
        np.testing.assert_array_equal(bv[:, i], sv[:, 0])


def test_eos_in_one_stream_does_not_perturb_other(tiny_config, params):
    cfg = tiny_config
    bucket = 16
    tie, mask, _ = _prompts(cfg, [12, 12], bucket)
    sampling = SamplingParams(do_sample=False)
    H = cfg.talker.hidden_size
    tth = jnp.zeros((2, 4, H), jnp.float32)
    tpe = jnp.zeros((2, 1, H), jnp.float32)
    state, _ = core.start_state(
        params["talker"], cfg.talker, jnp.asarray(tie), jnp.asarray(mask),
        jax.random.PRNGKey(0), 64, sampling, 0,
    )
    # force stream 0 onto EOS before the chunk
    eos = cfg.talker.codec_eos_token_id
    token = np.asarray(state.token).copy()
    live_token = int(token[1])
    token[0] = eos
    state = state._replace(token=jnp.asarray(token))
    state, packed = core.decode_chunk(
        params["talker"], params["predictor"], cfg.talker, cfg.predictor,
        state, tth, tpe, 4, sampling, sampling, 0,
    )
    frames, valid, done = gen_lib.GenerationSession.materialize_batch(packed)
    assert not valid[:, 0].any() and done[0]
    assert valid[:, 1].all() and not done[1]
    # stream 1's first frame starts from its own (unmodified) token
    assert frames[0, 1, 0] == live_token


def test_materialize_single_is_stream0_view(tiny_config, params):
    cfg = tiny_config
    tie, mask, _ = _prompts(cfg, [8, 11], 16)
    bf, bv, bd, _ = _decode(params, cfg, tie, mask, chunk=4, n_chunks=1)
    # reproduce via the B=1 materialize on the same packed output
    sampling = SamplingParams(do_sample=False)
    H = cfg.talker.hidden_size
    state, _ = core.start_state(
        params["talker"], cfg.talker, jnp.asarray(tie), jnp.asarray(mask),
        jax.random.PRNGKey(0), 64, sampling, 2,
    )
    state, packed = core.decode_chunk(
        params["talker"], params["predictor"], cfg.talker, cfg.predictor,
        state, jnp.zeros((2, 4, H)), jnp.zeros((2, 1, H)), 4, sampling, sampling, 2,
    )
    solo_frames, solo_done = gen_lib.GenerationSession.materialize(packed)
    np.testing.assert_array_equal(solo_frames, bf[bv[:, 0], 0])
    assert solo_done == bool(bd[0])
