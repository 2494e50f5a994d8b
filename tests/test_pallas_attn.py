"""Pallas decode-attention kernel vs XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu.ops.attention import decode_attention_xla


@pytest.mark.parametrize("pads,pos", [(0, 10), (0, 300), (5, 100), (3, 511)])
def test_pallas_matches_xla(pads, pos):
    from jax.experimental.pallas import tpu as pltpu

    from faster_qwen3_tts_tpu.ops import decode_attn_pallas as dp

    B, Hq, Hkv, D, S = 1, 4, 2, 64, 512
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    ids = np.arange(S)
    mask = jnp.asarray(((ids >= pads) & (ids <= pos)).astype(np.int32))[None, :]

    ref = decode_attention_xla(q, k, v, mask)
    with pltpu.force_tpu_interpret_mode():
        out = dp.decode_attention_pallas(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
