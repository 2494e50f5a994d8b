"""Reference-audio analysis: ECAPA-TDNN speaker encoder + codec encoder.

Plays the role of the upstream voice-reference pipeline the reference calls
through `create_voice_clone_prompt` (reference model.py:429-451): raw audio ->
(a) a 2048-d speaker embedding (x-vector) and (b) [T,16] RVQ codec tokens for
ICL prompting. The reference never implements these (they live in upstream
`qwen_tts`); this framework owns them, using the PUBLIC architectures of each
family (torch-parity-tested in tests/test_encoder_torch_parity.py):

- Mel frontend: host-side numpy STFT (runs once per voice; results cached by
  the model layer, reference model.py:424-427).
- Speaker encoder: **the public Qwen ECAPA** (transformers qwen2_5_omni
  `ECAPA_TimeDelayNet` — ECAPA-TDNN, Desplanques et al. 2020), matched
  module-for-module and numerically validated against that torch class in
  tests/test_encoder_torch_parity.py: reflect-padded Conv1d/TDNN stem,
  SE-Res2Net blocks at dilations 2/3/4, multi-layer feature aggregation,
  channel-wise attentive statistics pooling (masked here so bucket padding
  is exact), k=1-conv fc to the 2048-d embedding the upstream prompt items
  carry (reference README.md:500).
- Codec encoder: the structural **mirror of the Code2Wav decoder** that is
  numerically validated against torch in tests/test_hf_import.py — SEANet-
  style strided causal conv blocks with snake-beta residual units reversing
  the decoder's upsample geometry (1920x downsample), ConvNeXt downsample
  stages reversing the decoder's upsample stages, the same sliding-window
  pre-transformer, then residual vector quantization against the decoder's
  own 16 codebooks so encode -> decode round-trips through one embedding
  space.

TPU notes: channels-last [B, T, C] throughout, static shapes under jit with
host-side length bucketing, f32 accumulation on every conv/matmul.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig, Qwen3TTSConfig, SpeakerEncoderConfig
from ..utils import audio as audio_lib
from .codec import (
    causal_conv1d,
    convnext_block,
    pre_transformer,
    residual_unit,
    snake_beta,
    _RES_DILATIONS,
)


# ---------------------------------------------------------------------------
# Mel frontend (host-side numpy; tiny cost, once per voice)
# ---------------------------------------------------------------------------


def mel_spectrogram(
    audio: np.ndarray,
    sr: int,
    n_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    target_sr: int = 16000,
) -> np.ndarray:
    """audio [n] float32 -> log-mel [frames, n_mels] float32."""
    audio = audio_lib.resample(audio, sr, target_sr)
    if len(audio) < n_fft:
        audio = np.pad(audio, (0, n_fft - len(audio)))
    window = np.hanning(n_fft).astype(np.float32)
    n_frames = 1 + (len(audio) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = audio[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [frames, n_fft//2+1]

    # mel filterbank
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    fmin, fmax = 0.0, target_sr / 2
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / target_sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        if c > lo:
            fb[m - 1, lo:c] = (np.arange(lo, c) - lo) / max(c - lo, 1)
        if hi > c:
            fb[m - 1, c:hi] = (hi - np.arange(c, hi)) / max(hi - c, 1)
    mel = spec @ fb.T
    return np.log(np.maximum(mel, 1e-10)).astype(np.float32)


# ---------------------------------------------------------------------------
# Speaker encoder: ECAPA-TDNN
# ---------------------------------------------------------------------------


def _tdnn_init(rng, cin, cout, k, np_dtype=np.float32):
    w = rng.standard_normal((k, cin, cout), dtype=np.float32) / math.sqrt(cin * k)
    return {"w": np.asarray(w, np_dtype), "b": np.zeros(cout, np_dtype)}


def init_speaker_params(seed: int, cfg: SpeakerEncoderConfig, dtype=jnp.float32, rng=None) -> Dict:
    """ECAPA-TDNN parameter tree (see module docstring)."""
    rng = rng if rng is not None else np.random.default_rng(seed)
    C, S = cfg.channels, cfg.res2net_scale
    assert C % S == 0, "channels must divide res2net_scale"
    W = C // S

    def lin(cin, cout):
        w = rng.standard_normal((cin, cout), dtype=np.float32) / math.sqrt(cin)
        return np.asarray(w, np.float32), np.zeros(cout, np.float32)

    params: Dict = {"in": _tdnn_init(rng, cfg.mel_bins, C, 5)}
    for i in range(cfg.num_blocks):
        params[f"block{i}"] = {
            "tdnn1": _tdnn_init(rng, C, C, 1),
            "res2": [_tdnn_init(rng, W, W, 3) for _ in range(S - 1)],
            "tdnn2": _tdnn_init(rng, C, C, 1),
            "se1": lin(C, cfg.se_channels),
            "se2": lin(cfg.se_channels, C),
        }
    params["mfa"] = _tdnn_init(rng, cfg.num_blocks * C, cfg.mfa_dim, 1)
    params["att_tdnn"] = _tdnn_init(rng, 3 * cfg.mfa_dim, cfg.attention_channels, 1)
    params["att_proj"] = lin(cfg.attention_channels, cfg.mfa_dim)
    params["out"] = lin(2 * cfg.mfa_dim, cfg.embedding_dim)
    return params


_STAT_EPS = 1e-12  # public module's std clamp (ECAPA AttentiveStatisticsPooling.eps)


def _reflect_pad(x: jax.Array, length: jax.Array, pad: int) -> jax.Array:
    """Length-aware reflect-"same" padding: [B,T,C] -> [B,T+2*pad,C].

    The public ECAPA (transformers qwen2_5_omni ECAPA_TimeDelayNet) runs
    every conv with padding="same", padding_mode="reflect" on EXACT-length
    input. This framework bucket-pads for static shapes; a plain zero or
    buffer-edge reflect pad would make the last `pad` valid conv outputs
    read zeros/garbage where upstream reads reflected frames. One gather in
    original coordinates builds the exact reflect extension of the VALID
    signal (position t -> x[2*length-2-t] beyond it, x[-t] before it), so
    valid outputs are bit-exact vs the unpadded torch forward at any bucket
    size (pooled statistics mask the rest)."""
    T = x.shape[1]
    t = jnp.arange(-pad, T + pad)[None, :]
    L = length[:, None]
    src = jnp.where(t < 0, -t, jnp.where(t < L, t, jnp.clip(2 * L - 2 - t, 0, T - 1)))
    return jnp.take_along_axis(x, src[:, :, None], axis=1)


def _tdnn(p, x, length, dilation=1):
    """Public TimeDelayNetBlock: reflect-"same" dilated Conv1d -> ReLU
    (no norm — the transformers module has none). x: [B,T,Cin] -> [B,T,Cout]."""
    w = p["w"]
    k = w.shape[0]
    pad = (k - 1) * dilation // 2
    if pad:
        x = _reflect_pad(x, length, pad)
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=jnp.float32,
    )
    return jax.nn.relu((y + p["b"]).astype(x.dtype))


def _se_res2_block(p, x, length, dilation, scale, mask):
    """Public SqueezeExcitationRes2NetBlock: tdnn1 -> Res2Net -> tdnn2 -> SE -> +x."""
    h = _tdnn(p["tdnn1"], x, length)
    # Public Res2Net: y_0 = x_0 (pass-through), y_1 = conv_0(x_1) with NO
    # addition, y_i = conv_{i-1}(x_i + y_{i-1}) for i >= 2.
    parts = jnp.split(h, scale, axis=-1)
    outs = [parts[0]]
    y = None
    for i in range(1, scale):
        inp = parts[i] if y is None else parts[i] + y
        y = _tdnn(p["res2"][i - 1], inp, length, dilation=dilation)
        outs.append(y)
    h = jnp.concatenate(outs, axis=-1)
    h = _tdnn(p["tdnn2"], h, length)
    # Squeeze-excitation. The public module means over the full time axis
    # (it always runs unpadded); the masked mean below equals it at exact
    # length and keeps bucket padding out of the statistic.
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)  # [B,1]
    s = jnp.sum(h * mask[..., None], axis=1) / denom  # [B, C]
    w1, b1 = p["se1"]
    w2, b2 = p["se2"]
    s = jax.nn.relu(jnp.dot(s, w1, preferred_element_type=jnp.float32) + b1)
    s = jax.nn.sigmoid(jnp.dot(s.astype(h.dtype), w2, preferred_element_type=jnp.float32) + b2)
    return x + h * s[:, None, :].astype(h.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def speaker_forward(params, cfg: SpeakerEncoderConfig, mel: jax.Array, mask: jax.Array) -> jax.Array:
    """mel [B, T, n_mels], mask [B, T] (1=valid) -> x-vector [B, embedding_dim].

    Forward of the PUBLIC Qwen speaker encoder (transformers
    qwen2_5_omni.modeling ECAPA_TimeDelayNet), numerically validated against
    that torch class in tests/test_encoder_torch_parity.py. Padded frames
    are excluded from every statistic (SE means, attention softmax, pooled
    mean/std) and conv edges use the reflect-continuation fix, so bucket
    padding cannot change the embedding."""
    length = jnp.sum(mask, axis=1).astype(jnp.int32)  # [B]
    h1 = _tdnn(params["in"], mel, length, dilation=1)
    feats = []
    h = h1
    for i in range(cfg.num_blocks):
        h = _se_res2_block(params[f"block{i}"], h, length, i + 2, cfg.res2net_scale, mask)
        feats.append(h)
    h = _tdnn(params["mfa"], jnp.concatenate(feats, axis=-1), length)  # [B, T, mfa]

    # Channel-wise attentive statistics pooling with global context
    # (public AttentiveStatisticsPooling; eps and op order mirrored).
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)  # [B,1]
    m = mask[..., None]
    mean_g = jnp.sum(h * m, axis=1) / denom  # [B, mfa]
    var_g = jnp.sum(jnp.square(h - mean_g[:, None, :]) * m, axis=1) / denom
    std_g = jnp.sqrt(jnp.maximum(var_g, _STAT_EPS))
    ctx = jnp.concatenate(
        [h, jnp.broadcast_to(mean_g[:, None, :], h.shape),
         jnp.broadcast_to(std_g[:, None, :], h.shape)], axis=-1
    )  # [B, T, 3*mfa]
    a = jnp.tanh(_tdnn(params["att_tdnn"], ctx, length))
    aw, ab = params["att_proj"]
    e = jnp.dot(a, aw, preferred_element_type=jnp.float32) + ab  # [B, T, mfa]
    e = jnp.where(m > 0, e, -1e30)
    alpha = jax.nn.softmax(e, axis=1)  # masked softmax over time, per channel
    mean = jnp.sum(alpha * h.astype(jnp.float32), axis=1)
    var = jnp.sum(alpha * jnp.square(h.astype(jnp.float32) - mean[:, None, :]), axis=1)
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, _STAT_EPS))], axis=-1)
    ow, ob = params["out"]
    return jnp.dot(stats, ow, preferred_element_type=jnp.float32) + ob


# Backwards-compat alias (older tests/benches referenced the private name).
_speaker_forward = speaker_forward


# ---------------------------------------------------------------------------
# Codec encoder: mirror of the Code2Wav decoder (audio -> latents)
# ---------------------------------------------------------------------------


def encoder_dims(cfg: CodecConfig) -> Tuple[int, ...]:
    """Channel plan: the decoder halves decoder_dim per upsample block
    (codec.init_params); the encoder mirror doubles from the decoder's
    narrowest width back up to decoder_dim."""
    n = len(cfg.upsample_rates)
    base = cfg.decoder_dim // (2 ** n)
    return tuple(base * (2 ** i) for i in range(n + 1))


def init_encoder_params(seed: int, cfg: CodecConfig, dtype=jnp.float32, rng=None) -> Dict:
    """SEANet-style mirror of the Code2Wav decoder (see module docstring)."""
    from .codec import init_params as _codec_init

    rng = rng if rng is not None else np.random.default_rng(seed)

    def conv(cin, cout, k, groups=1):
        w = rng.standard_normal((k, cin // groups, cout), dtype=np.float32)
        w = w * (0.5 / math.sqrt(max(cin // groups * k, 1)))
        return np.asarray(w, np.float32), np.zeros(cout, np.float32)

    def lin(cin, cout):
        w = rng.standard_normal((cin, cout), dtype=np.float32) * cin**-0.5
        return np.asarray(w, np.float32), np.zeros(cout, np.float32)

    def res_unit(dim):
        c1_w, c1_b = conv(dim, dim, 7)
        c2_w, c2_b = conv(dim, dim, 1)
        return {
            "a1": np.zeros(dim, np.float32), "b1": np.zeros(dim, np.float32),
            "c1_w": c1_w, "c1_b": c1_b,
            "a2": np.zeros(dim, np.float32), "b2": np.zeros(dim, np.float32),
            "c2_w": c2_w, "c2_b": c2_b,
        }

    def convnext(dim):
        dw_w, dw_b = conv(dim, dim, 7, groups=dim)
        pw1_w, pw1_b = lin(dim, 4 * dim)
        pw2_w, pw2_b = lin(4 * dim, dim)
        return {
            "dw_w": dw_w, "dw_b": dw_b,
            "ln_w": np.ones(dim, np.float32), "ln_b": np.zeros(dim, np.float32),
            "pw1_w": pw1_w, "pw1_b": pw1_b, "pw2_w": pw2_w, "pw2_b": pw2_b,
            "gamma": np.full((dim,), 1e-6, np.float32),
        }

    dims = encoder_dims(cfg)
    C = cfg.hidden_size
    params: Dict = {}
    params["enc_in_w"], params["enc_in_b"] = conv(1, dims[0], 7)
    blocks = []
    # Block i: residual units at dims[i], snake, strided conv to dims[i+1];
    # stride reverses the decoder's upsample_rates.
    for i, rate in enumerate(reversed(cfg.upsample_rates)):
        blocks.append({
            "units": [res_unit(dims[i]) for _ in _RES_DILATIONS],
            "a": np.zeros(dims[i], np.float32), "b": np.zeros(dims[i], np.float32),
            "down_w": conv(dims[i], dims[i + 1], 2 * rate)[0],
            "down_b": np.zeros(dims[i + 1], np.float32),
        })
    params["blocks"] = blocks
    params["enc_mid_w"], params["enc_mid_b"] = conv(dims[-1], C, 7)
    downsample = []
    for factor in reversed(cfg.upsampling_ratios):
        downsample.append({
            "convnext": convnext(C),
            "down_w": conv(C, C, 2 * factor)[0],
            "down_b": np.zeros(C, np.float32),
        })
    params["downsample"] = downsample
    # Sliding-window pre-quantizer transformer: same architecture as the
    # decoder's pre_transformer (codec.pre_transformer), separate weights.
    full = _codec_init(seed + 1, cfg, dtype=dtype, rng=rng)
    params["pre_transformer"] = full["pre_transformer"]
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_latents(params, cfg: CodecConfig, audio: jax.Array) -> jax.Array:
    """audio [B, n, 1] -> latents [B, T, hidden] at the codec frame rate.

    Mirror of codec.decode_frames run in reverse order: conv stem ->
    4 strided encoder blocks (reversed upsample_rates) -> mid conv ->
    ConvNeXt downsample stages (reversed upsampling_ratios) -> sliding-window
    transformer."""
    h = causal_conv1d(audio, params["enc_in_w"], params["enc_in_b"])
    for blk, rate in zip(params["blocks"], reversed(cfg.upsample_rates)):
        for unit, dilation in zip(blk["units"], _RES_DILATIONS):
            h = residual_unit(unit, h, dilation)
        h = snake_beta(h, blk["a"], blk["b"])
        h = causal_conv1d(h, blk["down_w"], blk["down_b"], stride=rate)
    h = causal_conv1d(h, params["enc_mid_w"], params["enc_mid_b"])
    for stage, factor in zip(params["downsample"], reversed(cfg.upsampling_ratios)):
        h = convnext_block(stage["convnext"], h)
        h = causal_conv1d(h, stage["down_w"], stage["down_b"], stride=factor)
    return pre_transformer(params["pre_transformer"], h, cfg)


@functools.partial(jax.jit, static_argnames=("num_quantizers", "codebook_size"))
def _rvq_encode(code_embed: jax.Array, latents: jax.Array, num_quantizers: int, codebook_size: int):
    """Residual VQ against the decoder's own codebooks.

    code_embed: [num_quantizers*codebook_size, hidden] (the decoder table);
    latents: [1, T, hidden]. Returns codes [1, T, num_quantizers] int32.
    The decoder embeds codes as the MEAN over quantizers (codec.decode_frames),
    so each residual step targets `num_quantizers * residual`'s nearest code.
    """
    x = latents.astype(jnp.float32)
    target = x * num_quantizers  # decoder averages; quantizers sum

    def step(carry, q):
        residual = carry
        table = jax.lax.dynamic_slice(
            code_embed.astype(jnp.float32),
            (q * codebook_size, 0),
            (codebook_size, code_embed.shape[1]),
        )
        d = (
            jnp.sum(jnp.square(residual), -1, keepdims=True)
            - 2.0 * jnp.einsum("bth,ch->btc", residual, table)
            + jnp.sum(jnp.square(table), -1)[None, None, :]
        )
        idx = jnp.argmin(d, axis=-1)  # [1, T]
        chosen = jnp.take(table, idx, axis=0)  # [1, T, h]
        return residual - chosen, idx.astype(jnp.int32)

    residual, codes = jax.lax.scan(step, target, jnp.arange(num_quantizers))
    return jnp.transpose(codes, (1, 2, 0))  # [1, T, Q]


class VoiceExtractor:
    """Bundles the speaker encoder + codec encoder behind one object
    (constructed lazily by FasterQwen3TTS._get_voice_extractor)."""

    def __init__(self, params: Dict, cfg: Qwen3TTSConfig, seed: int = 7):
        self.cfg = cfg
        if "speaker_encoder" not in params:
            params["speaker_encoder"] = init_speaker_params(seed, cfg.speaker_encoder)
        if "codec_encoder" not in params:
            params["codec_encoder"] = init_encoder_params(seed + 1, cfg.codec)
        self.params = params

    def extract_xvector(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """audio -> 2048-d float32 x-vector (reference README 'speaker.pt'
        extraction surface, examples/extract_speaker.py)."""
        mel = mel_spectrogram(audio, sr, n_mels=self.cfg.speaker_encoder.mel_bins)
        T = mel.shape[0]
        bucket = 64
        while bucket < T:
            bucket *= 2
        padded = np.zeros((1, bucket, mel.shape[1]), np.float32)
        padded[0, :T] = mel
        mask = np.zeros((1, bucket), np.float32)
        mask[0, :T] = 1.0
        emb = speaker_forward(
            self.params["speaker_encoder"], self.cfg.speaker_encoder,
            jnp.asarray(padded), jnp.asarray(mask),
        )
        return np.asarray(emb, np.float32)[0]

    def extract_codes(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """audio -> [T, 16] RVQ codec tokens (the ICL acoustic prompt)."""
        ccfg = self.cfg.codec
        wav = audio_lib.resample(audio, sr, ccfg.sample_rate)
        up = ccfg.total_upsample
        n_frames = max(1, int(round(len(wav) / up)))
        need = n_frames * up
        wav = np.pad(wav, (0, max(0, need - len(wav))))[:need]
        # bucket the frame count to bound compiles
        bucket = 32
        while bucket < n_frames:
            bucket *= 2
        wav = np.pad(wav, (0, bucket * up - need))
        latents = encode_latents(
            self.params["codec_encoder"], ccfg, jnp.asarray(wav.reshape(1, -1, 1))
        )
        codes = _rvq_encode(
            self.params["codec"]["code_embed"], latents, ccfg.num_quantizers, ccfg.codebook_size
        )
        return np.asarray(codes, np.int32)[0, :n_frames]
