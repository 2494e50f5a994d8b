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


class QuantizedLinear4(NamedTuple):
    """Weight-only int4 linear with group-wise asymmetric (scale, min)
    quantization — the Q4_K_M-class mode (reference cli.py:357 /
    docs/ggml-backend.md): w ~= nibble * scale + wmin.

    packed: uint8 [..., in/2, out] — two 4-bit values per byte along the
            reduction dim (high nibble = even row, low nibble = odd row).
    scale:  f32   [..., in/group, out] — per-(input-group, output-channel).
    wmin:   f32   [..., in/group, out] — per-group minimum (zero point).
    """

    packed: jax.Array
    scale: jax.Array
    wmin: jax.Array

    @property
    def group(self) -> int:
        return 2 * self.packed.shape[-2] // self.scale.shape[-2]


def quantize_linear4(w, group: int = 32) -> QuantizedLinear4:
    """Host-side asymmetric int4 quantization with group-wise scale+min."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    I, O = wf.shape[-2], wf.shape[-1]
    if I % group:
        group = I  # tiny layers: one group
    g = wf.reshape(*wf.shape[:-2], I // group, group, O)
    wmin = np.min(g, axis=-2)  # [..., n_groups, O]
    scale = (np.max(g, axis=-2) - wmin) / 15.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round((g - wmin[..., None, :]) / scale[..., None, :]), 0, 15)
    q = q.astype(np.uint8).reshape(*wf.shape[:-2], I, O)
    hi, lo = q[..., 0::2, :], q[..., 1::2, :]
    packed = ((hi << 4) | lo).astype(np.uint8)
    return QuantizedLinear4(
        packed=packed, scale=scale.astype(np.float32), wmin=wmin.astype(np.float32)
    )


def _dot4(x: jax.Array, w: QuantizedLinear4) -> jax.Array:
    """Grouped int4 matmul via an even/odd-row split. f32 accumulation.

    The packing stores rows interleaved (high nibble = even row 2j, low
    nibble = odd row 2j+1), so

        y = x_even @ hi + x_odd @ lo        (per group, then scale+min)

    which keeps BOTH weight operands as uint8 arrays whose nibble-extract +
    convert can fuse into the dot reads — the earlier formulation stacked
    and reshaped the nibbles back into a full [in, out] matrix, which XLA
    materialized at activation width (MORE HBM traffic than unquantized,
    measured 2.2x slower end-to-end).

    y_g = sum_j x_g[2j] hi_g[j,o] + x_g[2j+1] lo_g[j,o]
    y   = sum_g y_g * scale_g + (sum_i x_g[i]) * min_g
    """
    p = w.packed  # [..., in/2, out]
    hi = jnp.right_shift(p, 4)
    lo = p & 0xF
    I2, O = p.shape[-2], p.shape[-1]
    n_groups = w.scale.shape[-2]
    G2 = I2 // n_groups  # packed rows per group
    lead = x.shape[:-1]
    xr = x.reshape(*lead, I2, 2)  # [..., in/2, 2]: [...,j,0]=x[2j], [...,j,1]=x[2j+1]
    x_even = xr[..., 0].reshape(*lead, n_groups, G2)
    x_odd = xr[..., 1].reshape(*lead, n_groups, G2)
    hi_g = hi.reshape(*p.shape[:-2], n_groups, G2, O).astype(x.dtype)
    lo_g = lo.reshape(*p.shape[:-2], n_groups, G2, O).astype(x.dtype)
    yg = jnp.einsum("...gi,gio->...go", x_even, hi_g, preferred_element_type=jnp.float32)
    yg = yg + jnp.einsum("...gi,gio->...go", x_odd, lo_g, preferred_element_type=jnp.float32)
    y = jnp.einsum("...go,go->...o", yg, w.scale.astype(jnp.float32))
    xsum = jnp.sum(x.reshape(*lead, n_groups, -1).astype(jnp.float32), axis=-1)
    y = y + jnp.einsum("...g,go->...o", xsum, w.wmin.astype(jnp.float32))
    return y.astype(x.dtype)


def dot(x: jax.Array, w) -> jax.Array:
    """x @ w with f32 accumulation; w may be a plain array, QuantizedLinear,
    or QuantizedLinear4. Result in x.dtype.

    The int8 branch is pure XLA by verdict, not by default: a hand-written
    Mosaic int8 matvec (grid-pipelined [BI, O] weight blocks, f32 VMEM
    accumulator) beat XLA by ~25% on an isolated feedback-chained probe, but
    lost its production A/B on the real chip (round 4, decode_profile fused
    frame: 0.6B Q8_0 5.25 vs 5.00 ms/frame, 1.7B 8.99 vs 8.98): inside the
    fused decode program every pallas_call is a fusion barrier — XLA loses
    the elementwise fusion and the cross-op weight-prefetch overlap it has in
    the pure-XLA schedule, which costs more than the kernel's streaming win.
    Third dead Pallas kernel (decode attention r2, predictor frame r3 — see
    ops/attention.py); the lesson generalizes: isolated-chain wins do not
    survive fusion-barrier costs at decode sizes on this chip.
    """
    if isinstance(w, QuantizedLinear4):
        return _dot4(x, w)
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


def dequantize(w):
    """QuantizedLinear / QuantizedLinear4 / plain -> f32 numpy (parity path,
    quality guardrails)."""
    import numpy as np

    if isinstance(w, QuantizedLinear):
        return np.asarray(w.q, np.float32) * np.asarray(w.scale, np.float32)
    if isinstance(w, QuantizedLinear4):
        p = np.asarray(w.packed)
        hi, lo = p >> 4, p & 0xF
        q = np.stack([hi, lo], axis=-2).reshape(*p.shape[:-2], 2 * p.shape[-2], p.shape[-1])
        I = q.shape[-2]
        scale = np.asarray(w.scale, np.float32)
        wmin = np.asarray(w.wmin, np.float32)
        n_groups = scale.shape[-2]
        g = q.reshape(*q.shape[:-2], n_groups, I // n_groups, q.shape[-1]).astype(np.float32)
        return (g * scale[..., None, :] + wmin[..., None, :]).reshape(q.shape)
    return np.asarray(w, np.float32)


def quantize_linear_jnp(w) -> QuantizedLinear:
    """Device-side (traceable) twin of `quantize_linear` — used when params
    were initialized on device (weights.init_all_device) so quantization runs
    in HBM instead of round-tripping weights to the host."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(q=q, scale=scale.astype(jnp.float32))


def quantize_linear4_jnp(w, group: int = 32) -> QuantizedLinear4:
    """Device-side twin of `quantize_linear4` (same packing layout)."""
    wf = w.astype(jnp.float32)
    I, O = wf.shape[-2], wf.shape[-1]
    g = wf.reshape(*wf.shape[:-2], I // group, group, O)
    wmin = jnp.min(g, axis=-2)
    scale = jnp.maximum((jnp.max(g, axis=-2) - wmin) / 15.0, 1e-12)
    q = jnp.clip(jnp.round((g - wmin[..., None, :]) / scale[..., None, :]), 0, 15)
    q = q.astype(jnp.uint8).reshape(*wf.shape[:-2], I, O)
    hi, lo = q[..., 0::2, :], q[..., 1::2, :]
    packed = ((hi << 4) | lo).astype(jnp.uint8)
    return QuantizedLinear4(
        packed=packed, scale=scale.astype(jnp.float32), wmin=wmin.astype(jnp.float32)
    )


def quantize_model_params(params: dict, mode: str = "int8") -> dict:
    """Quantize the large matmul weights of talker + predictor in place-shape.

    Embedding tables and norms stay in their original dtype (gathers only read
    the rows they need; norms are tiny and precision-sensitive). The codec
    decoder stays f32 (small fraction of FLOPs, waveform-quality sensitive).
    mode: "int8" (Q8_0-class, per-channel), "int4" (Q4_K_M-class,
    group-wise), or "mixed" (Q8_4: talker int8, predictor int4 — the
    predictor streams its weights 15x per frame, so int4 there cuts the
    dominant HBM term while the quality-sensitive talker stays int8).
    Host (numpy) params quantize on host; device-resident params quantize in
    ONE jitted program."""
    talker_mode, pred_mode = {
        "int8": ("int8", "int8"),
        "int4": ("int4", "int4"),
        "mixed": ("int8", "int4"),
    }[mode]
    leaves = jax.tree_util.tree_leaves(params)
    if any(isinstance(l, jax.Array) for l in leaves):
        # No donation: callers may keep using the unquantized originals
        # (tests compare against them), and XLA frees them as soon as the
        # caller drops its reference anyway. Routed through the AOT
        # executable cache (leaf shapes/dtypes are the signature) so a
        # serving restart skips this remote compile too.
        from ..engine import aot

        fns = {"int8": quantize_linear_jnp, "int4": quantize_linear4_jnp}
        return aot.call(
            f"quantize_model_params-{mode}",
            jax.jit(lambda p: _quantize_tree(p, fns[talker_mode], fns[pred_mode])),
            p=params,
        )
    fns = {"int8": quantize_linear, "int4": quantize_linear4}
    return _quantize_tree(params, fns[talker_mode], fns[pred_mode])


def _quantize_tree(params: dict, quantize_talker, quantize_pred) -> dict:
    out = dict(params)

    def quant_layers(layers: dict, quantize) -> dict:
        new = dict(layers)
        for k in _LAYER_WEIGHTS:
            new[k] = quantize(layers[k])
        return new

    t = dict(params["talker"])
    t["layers"] = quant_layers(t["layers"], quantize_talker)
    t["codec_head"] = quantize_talker(t["codec_head"])
    t["text_proj"] = {"w": quantize_talker(t["text_proj"]["w"]), "b": t["text_proj"]["b"]}
    out["talker"] = t

    p = dict(params["predictor"])
    p["layers"] = quant_layers(p["layers"], quantize_pred)
    p["lm_heads"] = quantize_pred(p["lm_heads"])
    p["mtp_proj"] = {"w": quantize_pred(p["mtp_proj"]["w"]), "b": p["mtp_proj"]["b"]}
    out["predictor"] = p
    return out


def infer_quant_mode(params: dict) -> str:
    """Infer the quantize_model_params mode from a parameter tree's leaf
    TYPES (for persisting already-loaded/quantized models as deploy
    bundles). Inverse of quantize_model_params over the modes it produces;
    raises on a combination it never produces."""

    def kind(x) -> str:
        if isinstance(x, QuantizedLinear):
            return "int8"
        if isinstance(x, QuantizedLinear4):
            return "int4"
        return "none"

    def probe(layers: dict):
        return layers["wqkv"] if "wqkv" in layers else layers["wq"]  # fused layout

    kt = kind(probe(params["talker"]["layers"]))
    kp = kind(probe(params["predictor"]["layers"]))
    if kt == kp:
        return kt
    if (kt, kp) == ("int8", "int4"):
        return "mixed"
    raise ValueError(f"unrecognized quantization layout: talker={kt}, predictor={kp}")


def resolve_quant_name(quant: str) -> str:
    """Map reference quant names (cli.py:357) onto this backend's modes."""
    key = (quant or "BF16").lower()
    if key in ("bf16", "f32", "fp32", "none", "float32", "bfloat16"):
        return "none"
    if key in ("q8_0", "int8", "q8"):
        return "int8"
    if key in ("q4_k_m", "q4_k", "int4", "q4", "q4_0"):
        return "int4"
    if key in ("q8_4", "mixed"):
        return "mixed"
    raise ValueError(
        f"Unsupported quant {quant!r}. Expected BF16/F32, Q8_0/int8, Q4_K_M/int4, "
        "or Q8_4/mixed (talker int8 + predictor int4)."
    )


def _concat_out(ws):
    """Concatenate linears along the output dim; handles plain /
    QuantizedLinear / QuantizedLinear4 (all per-output-channel metadata,
    so concatenation is exact)."""
    w0 = ws[0]
    if isinstance(w0, QuantizedLinear):
        return QuantizedLinear(
            q=jnp.concatenate([w.q for w in ws], axis=-1),
            scale=jnp.concatenate([w.scale for w in ws], axis=-1),
        )
    if isinstance(w0, QuantizedLinear4):
        return QuantizedLinear4(
            packed=jnp.concatenate([w.packed for w in ws], axis=-1),
            scale=jnp.concatenate([w.scale for w in ws], axis=-1),
            wmin=jnp.concatenate([w.wmin for w in ws], axis=-1),
        )
    import numpy as np

    xp = jnp if any(isinstance(w, jax.Array) for w in ws) else np
    return xp.concatenate(list(ws), axis=-1)


def fuse_layer_weights(params: dict) -> dict:
    """Fuse per-layer QKV and gate/up projections into single matmuls.

    Decode steps are [1, H] vector-matrix products; 7 small matmuls per
    layer become 4 larger ones — fewer fusions to launch and longer
    contiguous HBM weight reads for the same bytes. Numerically exact:
    each output column's dot product (and its per-channel quant scale) is
    unchanged by concatenation along the output dim.

    SINGLE-CHIP layout: tensor-parallel sharding needs per-head q/k/v
    splits, so parallel/mesh.py keeps the unfused names.
    """

    def fuse(layers: dict) -> dict:
        new = dict(layers)
        new["wqkv"] = _concat_out([new.pop("wq"), new.pop("wk"), new.pop("wv")])
        new["w_gateup"] = _concat_out([new.pop("w_gate"), new.pop("w_up")])
        return new

    out = dict(params)
    for sub in ("talker", "predictor"):
        m = dict(out[sub])
        m["layers"] = fuse(m["layers"])
        out[sub] = m
    return out
