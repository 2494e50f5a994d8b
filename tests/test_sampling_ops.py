"""Sampling-op math tests (mirrors reference tests/test_sampling.py:10-21
penalty checks, plus the suppress band and HF top-k/top-p order)."""
import jax
import jax.numpy as jnp
import numpy as np

from faster_qwen3_tts_tpu.ops import sampling as S


def test_repetition_penalty_math():
    logits = jnp.asarray([[2.0, -2.0, 1.0, 0.5]])
    seen = jnp.asarray([[True, True, False, False]])
    out = np.asarray(S.apply_repetition_penalty(logits, seen, 2.0))
    # positive seen logits divided, negative multiplied (reference sampling.py:26-28)
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0, 0.5])


def test_penalty_noop_at_one():
    logits = jnp.asarray([[1.0, 2.0]])
    seen = jnp.asarray([[True, True]])
    out = S.apply_repetition_penalty(logits, seen, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits))


def test_suppress_mask_band():
    m = np.asarray(S.make_suppress_mask(3072, eos_id=2150))
    assert not m[:2048].any()  # acoustic band free
    assert m[2048:2150].all() and m[2151:].all()
    assert not m[2150]  # EOS exempt


def test_greedy_respects_suppression():
    logits = jnp.zeros((1, 3072)).at[0, 3000].set(10.0).at[0, 100].set(5.0)
    mask = S.make_suppress_mask(3072, eos_id=2150)
    tok = S.sample_logits(
        jax.random.PRNGKey(0), logits, S.SamplingParams(do_sample=False), suppress_mask=mask
    )
    assert int(tok[0]) == 100  # 3000 is in the suppressed band


def test_top_k_restricts_support():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 2048)), jnp.float32)
    top5 = set(np.asarray(jnp.argsort(logits[0])[-5:]).tolist())
    params = S.SamplingParams(temperature=1.0, top_k=5, top_p=1.0, do_sample=True)
    draws = {
        int(S.sample_logits(jax.random.PRNGKey(i), logits, params)[0]) for i in range(50)
    }
    assert draws <= top5


def test_top_p_keeps_head():
    # one dominant logit -> top_p=0.5 keeps only it
    logits = jnp.zeros((1, 100)).at[0, 7].set(20.0)
    params = S.SamplingParams(temperature=1.0, top_k=0, top_p=0.5, do_sample=True)
    draws = {
        int(S.sample_logits(jax.random.PRNGKey(i), logits, params)[0]) for i in range(20)
    }
    assert draws == {7}


def test_suppress_extra_dynamic():
    logits = jnp.zeros((1, 16)).at[0, 3].set(9.0).at[0, 5].set(8.0)
    extra = (jnp.arange(16) == 3)[None, :]
    tok = S.sample_logits(
        jax.random.PRNGKey(0), logits, S.SamplingParams(do_sample=False), suppress_extra=extra
    )
    assert int(tok[0]) == 5
