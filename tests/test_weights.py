"""Checkpoint save/load roundtrip + HF import mapping tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu import weights as weights_lib


def test_save_load_roundtrip(tiny_config, tmp_path):
    params = weights_lib.init_all(tiny_config, seed=3, dtype=jnp.bfloat16)
    weights_lib.save_pretrained(str(tmp_path / "ckpt"), params, tiny_config)
    loaded, cfg = weights_lib.load_pretrained(str(tmp_path / "ckpt"))
    assert cfg.talker.hidden_size == tiny_config.talker.hidden_size
    assert cfg.predictor.num_hidden_layers == tiny_config.predictor.num_hidden_layers
    # exact bit roundtrip incl. bf16 leaves
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_from_pretrained_checkpoint_dir(tiny_config, tmp_path):
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS

    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    weights_lib.save_pretrained(str(tmp_path / "m"), params, cfg)
    model = FasterQwen3TTS.from_pretrained(str(tmp_path / "m"), max_seq_len=128)
    assert model.config.tts_bos_token_id == 300
    assert model.sample_rate == cfg.codec.sample_rate


def test_hf_import_maps_layers(tiny_config, tmp_path):
    """Torch-layout tensors ([out,in], per-layer) map into stacked [in,out]."""
    from safetensors.numpy import save_file

    cfg = tiny_config
    tc = cfg.talker
    rng = np.random.default_rng(0)
    raw = {}
    for i in range(tc.num_hidden_layers):
        raw[f"talker.model.layers.{i}.self_attn.q_proj.weight"] = rng.standard_normal(
            (tc.q_dim, tc.hidden_size), dtype=np.float32
        )
        raw[f"talker.model.layers.{i}.input_layernorm.weight"] = np.full(
            (tc.hidden_size,), 2.0, np.float32
        )
    raw["talker.codec_head.weight"] = rng.standard_normal(
        (tc.vocab_size, tc.hidden_size), dtype=np.float32
    )
    save_file(raw, str(tmp_path / "model-00001.safetensors"))
    params = weights_lib.load_hf_checkpoint(str(tmp_path), cfg, dtype=jnp.float32)
    # stacked, transposed
    wq = np.asarray(params["talker"]["layers"]["wq"])
    assert wq.shape == (tc.num_hidden_layers, tc.hidden_size, tc.q_dim)
    expect0 = raw["talker.model.layers.0.self_attn.q_proj.weight"].T
    np.testing.assert_allclose(wq[0], expect0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["talker"]["layers"]["ln1"][0]), 2.0
    )
    head = np.asarray(params["talker"]["codec_head"])
    np.testing.assert_allclose(head, raw["talker.codec_head.weight"].T, rtol=1e-6)
