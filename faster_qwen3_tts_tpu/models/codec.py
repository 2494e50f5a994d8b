"""Code2Wav neural codec decoder: [T,16] RVQ codes -> 24 kHz waveform, in JAX.

TPU-native replacement for the upstream `speech_tokenizer.decode` the
reference calls (reference model.py:918-924) and its 25-frame left-context
chunked decode (reference model.py:1048-1056; upstream chunked_decode
semantics). Architecture follows the public Code2Wav design: RVQ code
embedding mean -> sliding-window pre-transformer -> 2x ConvNeXt upsample
stages -> 4 transposed-conv decoder blocks with snake-beta activations ->
waveform clamp. Total upsample 2*2*8*5*4*3 = 1920 samples/frame (12.5 Hz).

TPU notes:
- Everything is channels-LAST [B, T, C] so the channel axis maps to lanes and
  1-D convs lower to MXU-friendly `lax.conv_general_dilated` calls.
- All shapes are static under jit; the host pads frame counts to buckets and
  slices the (causal) output, so streaming hits a handful of compiled shapes.
- Causal semantics (left-pad k_eff - stride) are preserved exactly so that
  decode(prefix) is a prefix of decode(full) — the property the streaming
  sliding-window decode relies on.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..config import CodecConfig
from .layers import rms_norm, rope_cos_sin, apply_rope

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Conv primitives (channels-last)
# ---------------------------------------------------------------------------

_DN = ("NWC", "WIO", "NWC")


def causal_conv1d(x, w, b, stride=1, dilation=1, groups=1):
    """Causal 1-D conv. x: [B, T, Cin], w: [K, Cin//groups, Cout], b: [Cout].

    Left-pads by (k_eff - stride) and right-pads to complete an integral
    number of output frames (mirrors the upstream causal-conv padding rule).
    """
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_left = k_eff - stride
    length = x.shape[1]
    n_frames = (length - k_eff + pad_left) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad_left)
    extra = int(ideal - length)
    x = jnp.pad(x, ((0, 0), (pad_left, max(extra, 0)), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def causal_trans_conv1d(x, w, b, stride):
    """Causal transposed 1-D conv. x: [B, T, Cin], w: [K, Cin, Cout].

    Produces (T-1)*stride + K samples then trims (K - stride) from EACH side,
    preserving the upstream trim rule (so sample counts — and therefore the
    streaming `samples_per_frame` calibration the reference performs at
    model.py:1108-1114 — match).
    """
    k = w.shape[0]
    y = jax.lax.conv_transpose(
        x,
        w,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    y = (y + b.astype(jnp.float32)).astype(x.dtype)
    pad = k - stride
    if pad > 0:
        y = y[:, pad : y.shape[1] - pad, :]
    return y


def snake_beta(x, alpha, beta):
    """SnakeBeta activation: x + 1/(e^beta+eps) * sin^2(x * e^alpha)."""
    a = jnp.exp(alpha.astype(jnp.float32))
    bno = jnp.exp(beta.astype(jnp.float32)) + 1e-9
    xf = x.astype(jnp.float32)
    return (xf + jnp.square(jnp.sin(xf * a)) / bno).astype(x.dtype)


def layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def convnext_block(p, x):
    """ConvNeXt block: depthwise conv7 -> LN -> pw1 -> GELU -> pw2 -> gamma."""
    h = causal_conv1d(x, p["dw_w"], p["dw_b"], groups=x.shape[-1])
    h = layer_norm(h, p["ln_w"], p["ln_b"])
    h = jnp.dot(h, p["pw1_w"], preferred_element_type=jnp.float32) + p["pw1_b"].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h.astype(x.dtype), p["pw2_w"], preferred_element_type=jnp.float32) + p["pw2_b"].astype(jnp.float32)
    return x + (p["gamma"].astype(jnp.float32) * h).astype(x.dtype)


_RES_DILATIONS = (1, 3, 9)  # per decoder block (structural constant)


def residual_unit(p, x, dilation):
    h = snake_beta(x, p["a1"], p["b1"])
    h = causal_conv1d(h, p["c1_w"], p["c1_b"], dilation=dilation)
    h = snake_beta(h, p["a2"], p["b2"])
    h = causal_conv1d(h, p["c2_w"], p["c2_b"])
    return x + h


def decoder_block(p, x, upsample_rate):
    h = snake_beta(x, p["a"], p["b"])
    h = causal_trans_conv1d(h, p["up_w"], p["up_b"], stride=upsample_rate)
    for unit, dilation in zip(p["units"], _RES_DILATIONS):
        h = residual_unit(unit, h, dilation)
    return h


def _pre_transformer_layer(p, x, cos, sin, mask, cfg: CodecConfig):
    B, T, C = x.shape
    H, D = cfg.num_attention_heads, cfg.head_dim
    h = rms_norm(p["ln1"], x, cfg.rms_norm_eps)
    q = jnp.dot(h, p["wq"], preferred_element_type=jnp.float32).astype(x.dtype).reshape(B, T, H, D)
    k = jnp.dot(h, p["wk"], preferred_element_type=jnp.float32).astype(x.dtype).reshape(B, T, H, D)
    v = jnp.dot(h, p["wv"], preferred_element_type=jnp.float32).astype(x.dtype).reshape(B, T, H, D)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * (D**-0.5)
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32)).reshape(B, T, H * D)
    attn = jnp.dot(attn.astype(x.dtype), p["wo"], preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + p["scale_attn"].astype(x.dtype) * attn
    h = rms_norm(p["ln2"], x, cfg.rms_norm_eps)
    gate = jnp.dot(h, p["w_gate"], preferred_element_type=jnp.float32)
    up = jnp.dot(h, p["w_up"], preferred_element_type=jnp.float32)
    mlp = jnp.dot(
        (jax.nn.silu(gate) * up).astype(x.dtype), p["w_down"], preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return x + p["scale_mlp"].astype(x.dtype) * mlp


def pre_transformer(p, x, cfg: CodecConfig):
    """Sliding-window causal transformer over frames (window = cfg.sliding_window)."""
    B, T, C = x.shape
    pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    qpos = jnp.arange(T)[:, None]
    kpos = jnp.arange(T)[None, :]
    mask = (kpos <= qpos) & (kpos > qpos - cfg.sliding_window)
    mask = mask[None, None, :, :]

    def body(h, lp):
        return _pre_transformer_layer(lp, h, cos, sin, mask, cfg), None

    h, _ = jax.lax.scan(body, x, p["layers"])
    return rms_norm(p["final_norm"], h, cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# Full decoder
# ---------------------------------------------------------------------------


def decode_frames(params, cfg: CodecConfig, codes: jax.Array) -> jax.Array:
    """codes: [B, T, 16] int32 -> waveform [B, n_samples] in [-1, 1].

    n_samples = 480*(4T) - 555 for the default geometry (the decoder blocks'
    symmetric trans-conv trim makes the total slightly less than 1920*T; the
    reference calibrates `samples_per_frame` empirically for exactly this
    reason, model.py:1108-1114).
    """
    B, T, Q = codes.shape
    offsets = jnp.arange(cfg.num_quantizers, dtype=codes.dtype) * cfg.codebook_size
    emb = jnp.take(params["code_embed"], codes + offsets[None, None, :], axis=0)
    h = jnp.mean(emb.astype(jnp.float32), axis=2).astype(emb.dtype)  # [B, T, C]

    h = pre_transformer(params["pre_transformer"], h, cfg)

    for stage, factor in zip(params["upsample"], cfg.upsampling_ratios):
        h = causal_trans_conv1d(h, stage["up_w"], stage["up_b"], stride=factor)
        h = convnext_block(stage["convnext"], h)

    h = causal_conv1d(h, params["dec_in_w"], params["dec_in_b"])
    for i, blk in enumerate(params["blocks"]):
        h = decoder_block(blk, h, cfg.upsample_rates[i])
    h = snake_beta(h, params["out_a"], params["out_b"])
    h = causal_conv1d(h, params["dec_out_w"], params["dec_out_b"])
    wav = jnp.clip(h[..., 0].astype(jnp.float32), -1.0, 1.0)
    return wav


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_frames_jit(params, cfg: CodecConfig, codes: jax.Array) -> jax.Array:
    return decode_frames(params, cfg, codes)


def chunked_decode(
    params,
    cfg: CodecConfig,
    codes: jax.Array,
    chunk_size: int = 300,
    left_context_size: int = 25,
) -> jax.Array:
    """Bounded-memory decode of long sequences with left-context overlap.

    Mirrors the upstream codec's chunked_decode contract the reference's
    streaming layer is built around (reference model.py:1048-1056).
    codes: [B, T, 16] -> [B, n_samples].
    """
    B, T, Q = codes.shape
    up = cfg.total_upsample
    wavs = []
    start = 0
    while start < T:
        end = min(start + chunk_size, T)
        ctx = left_context_size if start - left_context_size > 0 else start
        piece = codes[:, start - ctx : end]
        wav = decode_frames_jit(params, cfg, piece)
        wavs.append(wav[:, ctx * up :])
        start = end
    return jnp.concatenate(wavs, axis=-1)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def init_params(seed: int, cfg: CodecConfig, dtype=jnp.float32, rng=None):
    import numpy as np

    from .layers import _np_dtype

    np_dtype = _np_dtype(dtype)
    rng = np.random.default_rng(seed) if rng is None else rng

    def arr(x):
        return np.asarray(x, np_dtype)

    def zeros(*shape):
        return np.zeros(shape, np_dtype)

    def ones(*shape):
        return np.ones(shape, np_dtype)

    def full(shape, v):
        return np.full(shape, v, np_dtype)

    def conv(cin, cout, k, groups=1):
        # 0.5x gain keeps the randomly-initialized stack out of the +-1 clamp
        # (real checkpoints replace these; random init is for tests/bench).
        w = rng.standard_normal((k, cin // groups, cout), dtype=np.float32)
        w = w * (0.5 / math.sqrt(max(cin // groups * k, 1)))
        return arr(w), zeros(cout)

    def lin(cin, cout):
        w = rng.standard_normal((cin, cout), dtype=np.float32) * cin**-0.5
        return arr(w), zeros(cout)

    C = cfg.hidden_size

    def tlayer():
        wq, _ = lin(C, cfg.num_attention_heads * cfg.head_dim)
        wk, _ = lin(C, cfg.num_key_value_heads * cfg.head_dim)
        wv, _ = lin(C, cfg.num_key_value_heads * cfg.head_dim)
        wo, _ = lin(cfg.num_attention_heads * cfg.head_dim, C)
        wg, _ = lin(C, cfg.intermediate_size)
        wu, _ = lin(C, cfg.intermediate_size)
        wd, _ = lin(cfg.intermediate_size, C)
        return {
            "wq": wq, "wk": wk, "wv": wv, "wo": wo,
            "w_gate": wg, "w_up": wu, "w_down": wd,
            "ln1": ones(C), "ln2": ones(C),
            "scale_attn": full((C,), cfg.layer_scale_initial_scale),
            "scale_mlp": full((C,), cfg.layer_scale_initial_scale),
        }

    # Host-side stack, NOT jnp (jnp here would dispatch eager per-leaf device
    # transfers mid-init, which dominate load time on tunneled TPU setups);
    # stack_host keeps the device-init sentinel skeleton O(1).
    from .layers import stack_host

    layers_list = [tlayer() for _ in range(cfg.num_hidden_layers)]
    stacked = jax.tree.map(lambda *xs: stack_host(xs), *layers_list)

    def convnext(dim):
        dw_w, dw_b = conv(dim, dim, 7, groups=dim)
        pw1_w, pw1_b = lin(dim, 4 * dim)
        pw2_w, pw2_b = lin(4 * dim, dim)
        return {
            "dw_w": dw_w, "dw_b": dw_b,
            "ln_w": ones(dim), "ln_b": zeros(dim),
            "pw1_w": pw1_w, "pw1_b": pw1_b, "pw2_w": pw2_w, "pw2_b": pw2_b,
            "gamma": full((dim,), 1e-6),
        }

    upsample = []
    for factor in cfg.upsampling_ratios:
        up_w, up_b = conv(C, C, factor)
        upsample.append({"up_w": up_w, "up_b": up_b, "convnext": convnext(C)})

    def res_unit(dim):
        c1_w, c1_b = conv(dim, dim, 7)
        c2_w, c2_b = conv(dim, dim, 1)
        return {
            "a1": zeros(dim), "b1": zeros(dim),
            "c1_w": c1_w, "c1_b": c1_b,
            "a2": zeros(dim), "b2": zeros(dim),
            "c2_w": c2_w, "c2_b": c2_b,
        }

    blocks = []
    for i, rate in enumerate(cfg.upsample_rates):
        in_dim = cfg.decoder_dim // (2**i)
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        up_w, up_b = conv(in_dim, out_dim, 2 * rate)
        blocks.append(
            {
                "a": zeros(in_dim), "b": zeros(in_dim),
                "up_w": up_w, "up_b": up_b,
                "units": [res_unit(out_dim) for _ in _RES_DILATIONS],
            }
        )

    out_dim = cfg.decoder_dim // (2 ** len(cfg.upsample_rates))
    dec_in_w, dec_in_b = conv(C, cfg.decoder_dim, 7)
    dec_out_w, dec_out_b = conv(out_dim, 1, 7)

    embed = arr(
        rng.standard_normal((cfg.codebook_size * cfg.num_quantizers, C), dtype=np.float32) * 0.02
    )

    return {
        "code_embed": embed,
        "pre_transformer": {"layers": stacked, "final_norm": ones(C)},
        "upsample": upsample,
        "dec_in_w": dec_in_w, "dec_in_b": dec_in_b,
        "blocks": blocks,
        "out_a": zeros(out_dim), "out_b": zeros(out_dim),
        "dec_out_w": dec_out_w, "dec_out_b": dec_out_b,
    }
