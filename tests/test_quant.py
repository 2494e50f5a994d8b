"""Int8 weight-only quantization tests (the reference's quant surface,
cli.py:357 / ggml_backend.py:123-147, realized inside the XLA compute path)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from faster_qwen3_tts_tpu.ops import quant


def test_quantized_dot_accuracy(rng):
    import jax

    w = jax.random.normal(rng, (256, 512), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.fold_in(rng, 1), (4, 256), jnp.float32)
    ql = quant.quantize_linear(w)
    assert ql.q.dtype == jnp.int8
    y_ref = np.asarray(x @ w)
    y_q = np.asarray(quant.dot(x, ql))
    rel = np.linalg.norm(y_q - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.01  # per-channel int8 is ~0.3% for gaussian weights


def test_resolve_quant_names():
    assert quant.resolve_quant_name("BF16") == "none"
    assert quant.resolve_quant_name("Q8_0") == "int8"
    assert quant.resolve_quant_name("int8") == "int8"
    with pytest.raises(ValueError):
        quant.resolve_quant_name("Q4_K_M")


def test_quantized_generation(tiny_config):
    """Full API generation with quantized weights produces valid frames."""
    from faster_qwen3_tts_tpu.model import FasterQwen3TTS
    from faster_qwen3_tts_tpu.utils.tokenizer import ByteTokenizer, PromptTokenizer
    from faster_qwen3_tts_tpu import weights as weights_lib

    cfg = dataclasses.replace(
        tiny_config, tts_bos_token_id=300, tts_eos_token_id=301, tts_pad_token_id=302
    )
    params = weights_lib.init_all(cfg, seed=0, dtype=jnp.float32)
    params = quant.quantize_model_params(params)
    model = FasterQwen3TTS(params, cfg, PromptTokenizer(ByteTokenizer()), max_seq_len=128)
    model._warmed_up = True
    prompt = {
        "ref_spk_embedding": [np.random.default_rng(0).standard_normal(2048).astype(np.float32)],
        "x_vector_only_mode": [True],
        "icl_mode": [False],
        "ref_code": [None],
    }
    audio, sr = model.generate_voice_clone(
        "Quantized hello.", "English", voice_clone_prompt=prompt,
        max_new_tokens=8, do_sample=False, seed=0,
    )
    assert audio[0].size > 500
    assert np.abs(audio[0]).max() <= 1.0
