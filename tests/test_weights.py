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


def test_init_all_device_matches_host_structure(tiny_config):
    """Device init: same pytree structure/shapes/dtypes as host init; random
    leaves regenerate at the right scale; constant leaves are exact."""
    host = weights_lib.init_all(tiny_config, seed=0, device_put=False)
    dev = weights_lib.init_all_device(tiny_config, seed=0)

    h_leaves, h_def = jax.tree_util.tree_flatten(host)
    d_leaves, d_def = jax.tree_util.tree_flatten(dev)
    assert h_def == d_def
    n_random = 0
    for h, d in zip(h_leaves, d_leaves):
        h = np.asarray(h)
        da = np.asarray(d)
        assert h.shape == da.shape and h.dtype == da.dtype
        hstd = float(np.std(np.asarray(h, np.float32)))
        # constant leaves (norm ones, biases, layer scales) must be exact
        if h.size and np.all(h == h.flat[0]):
            np.testing.assert_array_equal(da, h)
        elif h.size >= 256:
            n_random += 1
            dstd = float(np.std(np.asarray(da, np.float32)))
            assert dstd > 0, "random leaf came back constant"
            # scale recovered through the sentinel (bf16-rounded): ~same std
            assert 0.6 < dstd / max(hstd, 1e-30) < 1.6, (h.shape, hstd, dstd)
    assert n_random > 5  # the trick actually exercised random leaves


def test_device_init_quantizes_on_device(tiny_config):
    """quantize_model_params on device-resident params stays traceable and
    produces the same structure as the host path."""
    from faster_qwen3_tts_tpu.ops import quant as quant_lib

    dev = weights_lib.init_all_device(tiny_config, seed=0)
    q_dev = quant_lib.quantize_model_params(dev, "int8")
    host = weights_lib.init_all(tiny_config, seed=0, device_put=False)
    q_host = quant_lib.quantize_model_params(host, "int8")
    dl, ddef = jax.tree_util.tree_flatten(q_dev)
    hl, hdef = jax.tree_util.tree_flatten(q_host)
    assert ddef == hdef
    for d, h in zip(dl, hl):
        assert np.asarray(d).shape == np.asarray(h).shape
        assert np.asarray(d).dtype == np.asarray(h).dtype
    # int4 path too
    q4 = quant_lib.quantize_model_params(weights_lib.init_all_device(tiny_config, seed=1), "int4")
    assert jax.tree_util.tree_flatten(q4)[1] == jax.tree_util.tree_flatten(
        quant_lib.quantize_model_params(
            weights_lib.init_all(tiny_config, seed=1, device_put=False), "int4"
        )
    )[1]


def test_quantize_jnp_matches_numpy():
    """Device-side quantizers are numerically identical to the host ones."""
    from faster_qwen3_tts_tpu.ops import quant as quant_lib

    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 48), dtype=np.float32)
    q_np = quant_lib.quantize_linear(w)
    q_j = quant_lib.quantize_linear_jnp(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(q_j.q), q_np.q)
    np.testing.assert_allclose(np.asarray(q_j.scale), q_np.scale, rtol=1e-6)
    q4_np = quant_lib.quantize_linear4(w)
    q4_j = quant_lib.quantize_linear4_jnp(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(q4_j.packed), q4_np.packed)
    np.testing.assert_allclose(np.asarray(q4_j.scale), q4_np.scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q4_j.wmin), q4_np.wmin, rtol=1e-6)


def _raw_bytes(x):
    return np.ascontiguousarray(np.asarray(x)).reshape(-1).view(np.uint8)


def test_pack_transfer_bit_exact_quantized(tiny_config):
    """pack_transfer ships the whole tree (incl. QuantizedLinear/-4 nodes)
    as per-dtype mega-blobs and re-slices device-side BIT-exactly. This is
    the serving transfer path: per-leaf device_put costs ~0.35 s of RPC
    latency each through tunneled runtimes (round-5 warm-restart forensics,
    BENCH_NOTES.md)."""
    from faster_qwen3_tts_tpu.ops import quant as quant_lib

    params = weights_lib.init_all(tiny_config, seed=0, dtype=jnp.bfloat16, device_put=False)
    q = quant_lib.quantize_model_params(params, "mixed")
    dev = weights_lib.pack_transfer(q)
    fa = weights_lib._flatten_typed(q)
    fb = weights_lib._flatten_typed(dev)
    assert fa.keys() == fb.keys()
    for k in fa:
        a, b = np.asarray(fa[k]), np.asarray(fb[k])
        assert a.dtype == b.dtype and a.shape == b.shape, k
        np.testing.assert_array_equal(_raw_bytes(a), _raw_bytes(b), err_msg=k)
    assert isinstance(dev["talker"]["layers"]["wq"], quant_lib.QuantizedLinear)
    assert isinstance(dev["predictor"]["layers"]["wq"], quant_lib.QuantizedLinear4)


def test_deploy_bundle_compact_f32(tiny_config, tmp_path):
    """compact_f32 bundles store f32 leaves as bf16 on disk and upcast back
    to f32 inside the on-device unpack: dtypes round-trip to f32, values
    equal the bf16-rounded originals (lossless for real HF checkpoints whose
    source dtype IS bf16), and the file shrinks by the f32 section's half."""
    import ml_dtypes

    params = weights_lib.init_all(tiny_config, seed=0, dtype=jnp.float32, device_put=False)
    weights_lib.save_deploy_bundle(str(tmp_path / "full"), params, tiny_config)
    weights_lib.save_deploy_bundle(
        str(tmp_path / "compact"), params, tiny_config, compact_f32=True
    )
    full = (tmp_path / "full" / "bundle.bin").stat().st_size
    compact = (tmp_path / "compact" / "bundle.bin").stat().st_size
    assert compact < full * 0.75  # mostly-f32 tiny tree: ~halves

    p2, cfg2, _mode = weights_lib.load_deploy_bundle(str(tmp_path / "compact"))
    assert cfg2 == tiny_config
    fa, f2 = weights_lib._flatten_typed(params), weights_lib._flatten_typed(p2)
    assert fa.keys() == f2.keys()
    for k in fa:
        a, b = np.asarray(fa[k]), np.asarray(f2[k])
        assert a.dtype == b.dtype, k
        if a.dtype == np.float32:
            np.testing.assert_array_equal(
                a.astype(ml_dtypes.bfloat16).astype(np.float32), b, err_msg=k
            )
        else:
            np.testing.assert_array_equal(_raw_bytes(a), _raw_bytes(b), err_msg=k)


def test_deploy_bundle_roundtrip_and_from_pretrained(tiny_config, tmp_path):
    """save_deploy_bundle -> load_deploy_bundle is bit-exact, and
    from_pretrained(dir) detects the bundle, honors its quant mode, and
    rejects a conflicting quant request."""
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS
    from faster_qwen3_tts_tpu.ops import quant as quant_lib

    params = weights_lib.init_all(tiny_config, seed=0, dtype=jnp.float32, device_put=False)
    q = quant_lib.quantize_model_params(params, "int8")
    weights_lib.save_deploy_bundle(str(tmp_path), q, tiny_config, quant_mode="int8")
    p2, cfg2, mode = weights_lib.load_deploy_bundle(str(tmp_path))
    assert mode == "int8" and cfg2 == tiny_config
    fa, f2 = weights_lib._flatten_typed(q), weights_lib._flatten_typed(p2)
    for k in fa:
        np.testing.assert_array_equal(_raw_bytes(fa[k]), _raw_bytes(f2[k]), err_msg=k)

    m = FasterQwen3TTS.from_pretrained(str(tmp_path), quant="Q8_0", max_seq_len=128)
    assert isinstance(m.params["talker"]["layers"]["wq"], quant_lib.QuantizedLinear)
    with pytest.raises(ValueError, match="conflicts"):
        FasterQwen3TTS.from_pretrained(str(tmp_path), quant="Q4_K_M", max_seq_len=128)


def test_model_save_deploy_bundle_roundtrip(tiny_config, tmp_path):
    """model.save_deploy_bundle persists the CURRENT (quantized) params with
    an inferred quant mode; from_pretrained(dir) restores them bit-exactly
    (modulo the compact-f32 bf16 rounding, disabled here to pin bits)."""
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS, PromptTokenizer
    from faster_qwen3_tts_tpu.ops import quant as quant_lib
    from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer

    params = weights_lib.init_all(tiny_config, seed=0, dtype=jnp.float32)
    q = quant_lib.quantize_model_params(params, "mixed")
    m = FasterQwen3TTS(q, tiny_config, PromptTokenizer(ByteTokenizer()), max_seq_len=128)
    m.save_deploy_bundle(str(tmp_path / "b"), compact_f32=False)

    p2, cfg2, mode = weights_lib.load_deploy_bundle(str(tmp_path / "b"))
    assert mode == "mixed" and cfg2 == tiny_config
    fa, f2 = weights_lib._flatten_typed(q), weights_lib._flatten_typed(p2)
    assert fa.keys() == f2.keys()
    for k in fa:
        np.testing.assert_array_equal(
            _raw_bytes(np.asarray(fa[k])), _raw_bytes(np.asarray(f2[k])), err_msg=k
        )
    assert isinstance(p2["predictor"]["layers"]["wq"], quant_lib.QuantizedLinear4)


def test_infer_quant_mode():
    from faster_qwen3_tts_tpu.ops import quant as quant_lib

    def tree(t, p):
        return {"talker": {"layers": {"wq": t}}, "predictor": {"layers": {"wq": p}}}

    w = np.zeros((4, 4), np.float32)
    q8 = quant_lib.quantize_linear(w)
    q4 = quant_lib.quantize_linear4(np.zeros((32, 32), np.float32))
    assert quant_lib.infer_quant_mode(tree(w, w)) == "none"
    assert quant_lib.infer_quant_mode(tree(q8, q8)) == "int8"
    assert quant_lib.infer_quant_mode(tree(q4, q4)) == "int4"
    assert quant_lib.infer_quant_mode(tree(q8, q4)) == "mixed"
    with pytest.raises(ValueError, match="unrecognized"):
        quant_lib.infer_quant_mode(tree(q4, q8))


def test_unquantized_bundle_quantizes_on_load(tiny_config, tmp_path):
    """quant=Q8_0 on an UNQUANTIZED bundle quantizes after the device
    unpack instead of crashing on the not-yet-resident params
    (code-review r5 finding #4)."""
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS
    from faster_qwen3_tts_tpu.ops import quant as quant_lib

    params = weights_lib.init_all(tiny_config, seed=0, dtype=jnp.float32, device_put=False)
    weights_lib.save_deploy_bundle(str(tmp_path), params, tiny_config, quant_mode="none")
    m = FasterQwen3TTS.from_pretrained(str(tmp_path), quant="Q8_0", max_seq_len=128)
    assert isinstance(m.params["talker"]["layers"]["wq"], quant_lib.QuantizedLinear)


def test_bundle_carries_tokenizer_assets(tiny_config, tmp_path):
    """save_deploy_bundle copies tokenizer assets from the source checkpoint
    so a bundle restart doesn't silently byte-tokenize (code-review r5 #2)."""
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS

    src = tmp_path / "src"
    params = weights_lib.init_all(tiny_config, seed=0, dtype=jnp.float32, device_put=False)
    weights_lib.save_pretrained(str(src), params, tiny_config)
    (src / "tokenizer.json").write_text("{}")
    (src / "tokenizer_config.json").write_text("{}")

    m = FasterQwen3TTS.from_pretrained(str(src), max_seq_len=128)
    out = tmp_path / "bundle"
    m.save_deploy_bundle(str(out), compact_f32=False)
    assert (out / "tokenizer.json").exists()
    assert (out / "tokenizer_config.json").exists()
