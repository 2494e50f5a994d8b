"""Int8 weight-only quantization for the bandwidth-bound decode path.

The autoregressive decode loop is HBM-bandwidth-bound (every frame streams
all talker weights once and all predictor weights 15x). Int8 weights with
per-output-channel f32 scales halve that traffic; the int8->bf16 convert
fuses into the MXU matmul read, so there is no extra materialization.

This is the TPU-native counterpart of the reference's GGML quantized backend
(quant='Q8_0' at reference cli.py:357, ggml_backend.py:123-147): same user
surface (`from_pretrained(..., quant=...)`), but applied inside the XLA
compute path instead of a separate native runtime.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """Weight-only int8 linear: y = (x @ q) * scale.

    q:     int8 [..., in, out]
    scale: f32  [..., 1, out] (per-output-channel, absmax/127)
    """

    q: jax.Array
    scale: jax.Array


def quantize_linear(w) -> QuantizedLinear:
    """Quantize on HOST (numpy): quantization runs once at load time, and
    eager device ops are expensive in tunneled environments. Accepts numpy or
    device arrays; returns numpy leaves (shipped with the batched device_put
    in weights.init_all / model load)."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    scale = np.max(np.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return QuantizedLinear(q=q, scale=scale.astype(np.float32))


def dot(x: jax.Array, w) -> jax.Array:
    """x @ w with f32 accumulation; w may be a plain array or QuantizedLinear.
    Result in x.dtype."""
    if isinstance(w, QuantizedLinear):
        y = jax.lax.dot_general(
            x,
            w.q.astype(x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * w.scale.astype(jnp.float32).reshape(w.scale.shape[-1])).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


_LAYER_WEIGHTS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_model_params(params: dict) -> dict:
    """Quantize the large matmul weights of talker + predictor in place-shape.

    Embedding tables and norms stay in their original dtype (gathers only read
    the rows they need; norms are tiny and precision-sensitive). The codec
    decoder stays f32 (small fraction of FLOPs, waveform-quality sensitive).
    """
    out = dict(params)

    def quant_layers(layers: dict) -> dict:
        new = dict(layers)
        for k in _LAYER_WEIGHTS:
            new[k] = quantize_linear(layers[k])
        return new

    t = dict(params["talker"])
    t["layers"] = quant_layers(t["layers"])
    t["codec_head"] = quantize_linear(t["codec_head"])
    t["text_proj"] = {"w": quantize_linear(t["text_proj"]["w"]), "b": t["text_proj"]["b"]}
    out["talker"] = t

    p = dict(params["predictor"])
    p["layers"] = quant_layers(p["layers"])
    p["lm_heads"] = quantize_linear(p["lm_heads"])
    p["mtp_proj"] = {"w": quantize_linear(p["mtp_proj"]["w"]), "b": p["mtp_proj"]["b"]}
    out["predictor"] = p
    return out


def resolve_quant_name(quant: str) -> str:
    """Map reference quant names (cli.py:357) onto this backend's modes."""
    key = (quant or "BF16").lower()
    if key in ("bf16", "f32", "fp32", "none", "float32", "bfloat16"):
        return "none"
    if key in ("q8_0", "int8", "q8"):
        return "int8"
    raise ValueError(f"Unsupported quant {quant!r}. Expected BF16/F32 or Q8_0/int8.")
