"""Multi-chip SPMD sharding tests on the 8-virtual-device CPU mesh.

The reference has no distributed execution (SURVEY §2.3); these tests pin
the TPU-native extension: params TP-sharded Megatron-style, batch/KV over
dp, and the fused decode engine running SPMD unchanged. Greedy tokens must
be identical to the unsharded single-device run (fp32: no reduction-order
tolerance needed on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.engine import core
from faster_qwen3_tts_tpu.ops.sampling import SamplingParams
from faster_qwen3_tts_tpu.parallel import mesh as mesh_lib
from jax.sharding import NamedSharding, PartitionSpec as P


def _run_chunk(cfg, params, B, mesh=None):
    """Prefill + one greedy decode chunk; returns packed frames as numpy."""
    talker, pred = cfg.talker, cfg.predictor
    H = talker.hidden_size
    Pfx, max_seq, chunk = 16, 64, 4
    sampling = SamplingParams(do_sample=False)

    embeds = np.asarray(
        np.random.default_rng(0).standard_normal((B, Pfx, H), np.float32) * 0.02,
        np.float32,
    )
    pad_mask = np.ones((B, Pfx), np.int32)
    tth = np.zeros((B, 8, H), np.float32)
    tpe = np.zeros((B, 1, H), np.float32)
    if mesh is not None:
        embeds = jax.device_put(embeds, NamedSharding(mesh, P("dp", None, None)))
        pad_mask = jax.device_put(pad_mask, NamedSharding(mesh, P("dp", None)))
        tth = jax.device_put(tth, NamedSharding(mesh, P("dp", None, None)))
        tpe = jax.device_put(tpe, NamedSharding(mesh, P("dp", None, None)))
    else:
        embeds, pad_mask, tth, tpe = map(jnp.asarray, (embeds, pad_mask, tth, tpe))

    state, _ = core.start_state(
        params["talker"], talker, embeds, pad_mask, jax.random.PRNGKey(0),
        max_seq, sampling, 2,
    )
    state, packed = core.decode_chunk(
        params["talker"], params["predictor"], talker, pred,
        state, tth, tpe, chunk, sampling, sampling, 2,
    )
    return np.asarray(packed)


@pytest.fixture(scope="module")
def tiny_tp_config():
    """Tiny config with kv_heads divisible by tp=2 for both submodels."""
    from faster_qwen3_tts_tpu.config import (
        CodecConfig, PredictorConfig, Qwen3TTSConfig, TalkerConfig,
    )

    talker = TalkerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=3072, text_vocab_size=512, text_hidden_size=32,
    )
    pred = PredictorConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=16, intermediate_size=64,
    )
    return Qwen3TTSConfig(talker=talker, predictor=pred, codec=CodecConfig())


@pytest.fixture(scope="module")
def tiny_params(tiny_tp_config):
    return weights_lib.init_all(tiny_tp_config, seed=0, dtype=jnp.float32)


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must provision 8 virtual devices"


@pytest.mark.parametrize("dp,tp", [(4, 2), (8, 1)])
def test_sharded_decode_matches_unsharded(tiny_tp_config, tiny_params, dp, tp):
    cfg = tiny_tp_config
    ref = _run_chunk(cfg, tiny_params, B=dp)

    mesh = mesh_lib.make_mesh(8, dp=dp, tp=tp)
    sharded = mesh_lib.shard_params(
        {"talker": tiny_params["talker"], "predictor": tiny_params["predictor"]},
        mesh,
    )
    with mesh:
        got = _run_chunk(cfg, sharded, B=dp, mesh=mesh)

    np.testing.assert_array_equal(got, ref)


def test_shard_params_places_tp_shards(tiny_tp_config, tiny_params):
    """wq really lands split over the tp axis; norms replicated."""
    mesh = mesh_lib.make_mesh(8, dp=4, tp=2)
    sharded = mesh_lib.shard_params({"talker": tiny_params["talker"]}, mesh)
    wq = sharded["talker"]["layers"]["wq"]
    spec = wq.sharding.spec
    assert spec == P(None, None, "tp"), spec
    # Each shard holds half the head dim columns.
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    assert shard_shapes == {(wq.shape[0], wq.shape[1], wq.shape[2] // 2)}
    ln = sharded["talker"]["layers"]["ln1"]
    assert all(s.data.shape == ln.shape for s in ln.addressable_shards)


def test_kv_cache_spec_matches_layout():
    spec = mesh_lib.kv_cache_spec()
    assert spec == P(None, "dp", None, "tp", None)
