"""Engine-core tests: prefill/decode state machine, EOS semantics, fused loop.

Plays the role of the reference's model-free decode-loop tests
(reference tests/test_sampling.py:29-118 drives the real fast_generate loop
with dummy graphs); here the loop itself runs as the real jitted engine over
tiny random weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu.engine import core
from faster_qwen3_tts_tpu.models import predictor as predictor_lib
from faster_qwen3_tts_tpu.models import talker as talker_lib
from faster_qwen3_tts_tpu.ops.sampling import SamplingParams

MAX_SEQ = 64


@pytest.fixture(scope="module")
def params(tiny_config):
    tp = talker_lib.init_params(0, tiny_config.talker, dtype=jnp.float32)
    pp = predictor_lib.init_params(
        100, tiny_config.predictor, tiny_config.talker.hidden_size, dtype=jnp.float32
    )
    return tp, pp


def _start(tiny_config, params, rng, P=8, B=1, pads=0, min_new_tokens=2, greedy=True):
    tp, _ = params
    cfg = tiny_config.talker
    embeds = jax.random.normal(rng, (B, P, cfg.hidden_size), jnp.float32) * 0.1
    pad_mask = jnp.ones((B, P), jnp.int32)
    if pads:
        pad_mask = pad_mask.at[:, :pads].set(0)
    sampling = SamplingParams(do_sample=not greedy)
    state, logits = core.start_state(
        tp, cfg, embeds, pad_mask, jax.random.PRNGKey(7), MAX_SEQ, sampling, min_new_tokens
    )
    return state, logits, sampling


def test_start_state_shapes(tiny_config, params, rng):
    state, logits, _ = _start(tiny_config, params, rng, P=8, pads=3)
    cfg = tiny_config.talker
    assert state.cache.k.shape == (
        cfg.num_hidden_layers, 1, MAX_SEQ, cfg.num_key_value_heads, cfg.head_dim,
    )
    assert int(state.pos[0]) == 8
    assert int(state.num_pads[0]) == 3
    assert logits.shape == (1, cfg.vocab_size)
    # first token must respect the suppress band (top-1024 ids banned incl. EOS
    # because min_new_tokens > 0)
    assert int(state.token[0]) < cfg.vocab_size - 1024


def test_decode_chunk_emits_frames(tiny_config, params, rng):
    tp, pp = params
    cfg, pcfg = tiny_config.talker, tiny_config.predictor
    state, _, sampling = _start(tiny_config, params, rng)
    tth = jax.random.normal(rng, (1, 4, cfg.hidden_size), jnp.float32) * 0.1
    tpe = jnp.zeros((1, 1, cfg.hidden_size), jnp.float32)
    state, packed = core.decode_chunk(
        tp, pp, cfg, pcfg, state, tth, tpe, 6, sampling, sampling, 2
    )
    frames, valid = packed[:, :, :-2], packed[:, :, -2].astype(bool)
    assert frames.shape == (6, 1, 16)
    assert valid.shape == (6, 1)
    # Random weights essentially never sample EOS within the suppress band, so
    # all 6 frames should be valid, with codebook-0 outside the control band
    # and codebooks 1..15 inside the 2048-entry acoustic vocab.
    assert bool(jnp.all(valid))
    f = np.asarray(frames)
    assert f[:, :, 0].max() < cfg.vocab_size - 1024
    assert f[:, :, 1:].max() < pcfg.vocab_size
    assert int(state.n_frames[0]) == 6
    assert int(state.pos[0]) == 8 + 6


def test_eos_stops_generation(tiny_config, params, rng):
    """Force the current token to EOS: no further frames may be emitted."""
    tp, pp = params
    cfg, pcfg = tiny_config.talker, tiny_config.predictor
    state, _, sampling = _start(tiny_config, params, rng)
    state = state._replace(token=jnp.full_like(state.token, cfg.codec_eos_token_id))
    tth = jnp.zeros((1, 2, cfg.hidden_size), jnp.float32)
    tpe = jnp.zeros((1, 1, cfg.hidden_size), jnp.float32)
    state, packed = core.decode_chunk(
        tp, pp, cfg, pcfg, state, tth, tpe, 4, sampling, sampling, 0
    )
    valid = packed[:, :, -2].astype(bool)
    assert not bool(jnp.any(valid))
    assert bool(state.done[0])
    assert int(state.n_frames[0]) == 0


def test_max_seq_bound(tiny_config, params, rng):
    """Reference emits the boundary frame then stops (generate.py:175-177)."""
    tp, pp = params
    cfg, pcfg = tiny_config.talker, tiny_config.predictor
    state, _, sampling = _start(tiny_config, params, rng)
    state = state._replace(pos=jnp.full_like(state.pos, MAX_SEQ - 1))
    tth = jnp.zeros((1, 2, cfg.hidden_size), jnp.float32)
    tpe = jnp.zeros((1, 1, cfg.hidden_size), jnp.float32)
    state, packed = core.decode_chunk(
        tp, pp, cfg, pcfg, state, tth, tpe, 4, sampling, sampling, 0
    )
    v = np.asarray(packed[:, :, -2].astype(bool))[:, 0]
    assert v[0] and not v[1:].any()


def test_greedy_determinism(tiny_config, params, rng):
    """Greedy decode twice -> identical token streams (the parity anchor the
    reference's fp32 layer relies on, tests/test_e2e_parity.py:210-215)."""
    tp, pp = params
    cfg, pcfg = tiny_config.talker, tiny_config.predictor
    outs = []
    for _ in range(2):
        state, _, sampling = _start(tiny_config, params, rng)
        tth = jax.random.normal(jax.random.PRNGKey(3), (1, 4, cfg.hidden_size), jnp.float32) * 0.1
        tpe = jnp.zeros((1, 1, cfg.hidden_size), jnp.float32)
        state, packed = core.decode_chunk(
            tp, pp, cfg, pcfg, state, tth, tpe, 8, sampling, sampling, 2
        )
        outs.append(np.asarray(packed[:, :, :-2]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_left_padding_invariance(tiny_config, params, rng):
    """Left-padded prompt must produce the same greedy tokens as unpadded
    (the reference's padding-aware mask/rope contract, talker_graph.py:172-196)."""
    tp, pp = params
    cfg, pcfg = tiny_config.talker, tiny_config.predictor
    P = 8
    embeds = jax.random.normal(rng, (1, P, cfg.hidden_size), jnp.float32) * 0.1
    outs = []
    for pads in (0, 5):
        padded = jnp.concatenate(
            [jnp.zeros((1, pads, cfg.hidden_size), jnp.float32), embeds], axis=1
        )
        pad_mask = jnp.concatenate(
            [jnp.zeros((1, pads), jnp.int32), jnp.ones((1, P), jnp.int32)], axis=1
        )
        sampling = SamplingParams(do_sample=False)
        state, logits = core.start_state(
            tp, cfg, padded, pad_mask, jax.random.PRNGKey(7), MAX_SEQ, sampling, 2
        )
        tth = jax.random.normal(jax.random.PRNGKey(3), (1, 4, cfg.hidden_size), jnp.float32) * 0.1
        tpe = jnp.zeros((1, 1, cfg.hidden_size), jnp.float32)
        state, packed = core.decode_chunk(
            tp, pp, cfg, pcfg, state, tth, tpe, 6, sampling, sampling, 2
        )
        outs.append(np.asarray(packed[:, :, :-2]))
    np.testing.assert_array_equal(outs[0], outs[1])
