"""Pallas int8 decode-matvec: interpret-mode correctness vs ops.quant.dot.

The kernel's on-chip A/B lives in benchmarks/pallas_bw_probe.py and
benchmarks/decode_profile.py; these tests pin NUMERICS (same op order as the
XLA int8 branch: f32 accumulation, per-channel scale, cast to x.dtype) and
the routing/eligibility rules in quant.dot.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_qwen3_tts_tpu.ops import matvec_pallas as mvp
from faster_qwen3_tts_tpu.ops import quant


def _mk(I, O, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((I, O)).astype(np.float32) * 0.05
    q = quant.quantize_linear(w)
    return quant.QuantizedLinear(q=jnp.asarray(q.q), scale=jnp.asarray(q.scale))


@pytest.mark.parametrize("B,I,O", [(1, 256, 384), (4, 512, 128), (8, 1024, 256)])
def test_qmatvec_matches_xla_int8(B, I, O):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, I)), jnp.float32)
    w = _mk(I, O)
    ref = quant.dot(x, w)
    got = mvp.qmatvec(x, w.q, w.scale.reshape(1, O), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_qmatvec_bf16_dtype_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 256)), jnp.bfloat16)
    w = _mk(256, 128, seed=3)
    got = mvp.qmatvec(x, w.q, w.scale.reshape(1, 128), interpret=True)
    ref = quant.dot(x, w)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_dot_routes_through_pallas_when_enabled(monkeypatch):
    monkeypatch.delenv("FQ3T_DISABLE_PALLAS", raising=False)
    monkeypatch.setenv("FQ3T_PALLAS_MATVEC", "1")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 1, 256)), jnp.float32)  # [B,1,H] decode shape
    w = _mk(256, 384, seed=5)
    got = quant.dot(x, w)
    monkeypatch.setenv("FQ3T_PALLAS_MATVEC", "0")
    ref = quant.dot(x, w)
    assert got.shape == ref.shape == (2, 1, 384)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_eligibility_rules():
    assert mvp.eligible(1, 1024, 3072)
    assert mvp.eligible(16, 2048, 12288)
    assert not mvp.eligible(32, 1024, 3072)  # prefill-sized row count
    assert not mvp.eligible(1, 1000, 3072)  # unaligned reduction dim
    assert not mvp.eligible(1, 1024, 100)  # unaligned output dim


def test_kill_switch_respected(monkeypatch):
    monkeypatch.setenv("FQ3T_PALLAS_MATVEC", "1")
    monkeypatch.setenv("FQ3T_DISABLE_PALLAS", "1")
    assert not mvp.enabled()
