"""Test configuration: force CPU with an 8-device virtual mesh.

Tests never require TPU hardware (the reference's analogous constraint is
"GPU code tested without a GPU", SURVEY §4): compute runs on CPU, and
multi-chip sharding is validated on XLA's virtual host devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("FQ3T_DISABLE_PALLAS", "1")
# Small static trailing-text bucket: test texts are tiny; the production
# default (256) would just slow CPU compiles (shape-generic code either way).
os.environ.setdefault("FQ3T_TTH_BUCKET", "32")
# Strict scans on CPU: the production unroll defaults (4 / full) exist to
# overlap HBM streaming on TPU and only slow single-core CPU compiles here
# (suite 9 min -> 15+ min). Numerical equivalence across unroll settings is
# pinned by the goldens (verified under both).
os.environ.setdefault("FQ3T_SCAN_UNROLL", "1")
os.environ.setdefault("FQ3T_PRED_UNROLL", "1")

import pytest  # noqa: E402
import jax  # noqa: E402

# Force local CPU even when a TPU plugin was pre-registered at interpreter
# start (env JAX_PLATFORMS is consulted before the plugin registers, so the
# in-process config update is the reliable switch here).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: compiles are expensive in this environment.
jax.config.update("jax_compilation_cache_dir", "/tmp/fq3t_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def tiny_config():
    """A miniature Qwen3TTSConfig for fast CPU tests."""
    from faster_qwen3_tts_tpu.config import (
        CodecConfig,
        PredictorConfig,
        Qwen3TTSConfig,
        TalkerConfig,
    )

    talker = TalkerConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=128,
        vocab_size=3072,
        text_vocab_size=512,
        text_hidden_size=32,
    )
    predictor = PredictorConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        head_dim=16,
        intermediate_size=64,
        vocab_size=2048,
    )
    codec = CodecConfig(
        codebook_size=2048,
        num_quantizers=16,
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=64,
        sliding_window=8,
        upsampling_ratios=(2, 2),
        upsample_rates=(8, 5, 4, 3),
        decoder_dim=32,
    )
    return Qwen3TTSConfig(talker=talker, predictor=predictor, codec=codec)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
