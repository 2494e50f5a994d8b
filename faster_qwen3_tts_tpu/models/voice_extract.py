"""Reference-audio analysis: x-vector speaker encoder + RVQ codec encoder.

Plays the role of the upstream voice-reference pipeline the reference calls
through `create_voice_clone_prompt` (reference model.py:429-451): raw audio ->
(a) a 2048-d speaker embedding (x-vector) and (b) [T,16] RVQ codec tokens for
ICL prompting. The reference never implements these (they live in upstream
`qwen_tts`); this framework owns them:

- Mel frontend: host-side numpy STFT (runs once per voice; results cached by
  the model layer, reference model.py:424-427).
- Speaker encoder: conv stack + attentive statistics pooling -> 2048-d
  embedding, jitted with bucketed mel lengths.
- Codec encoder: mirror of the Code2Wav decoder (strided causal convs
  downsampling 1920x -> sliding-window transformer) followed by residual
  vector quantization against the decoder's own 16 codebooks, so
  encode -> decode round-trips through the same embedding space.
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
# Speaker encoder (x-vector)
# ---------------------------------------------------------------------------


def init_speaker_params(seed: int, cfg: SpeakerEncoderConfig, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k):
        w = rng.standard_normal((k, cin, cout), dtype=np.float32) / math.sqrt(cin * k)
        return jnp.asarray(w, dtype), jnp.asarray(np.zeros(cout, np.float32), dtype)

    def lin(cin, cout):
        w = rng.standard_normal((cin, cout), dtype=np.float32) / math.sqrt(cin)
        return jnp.asarray(w, dtype), jnp.asarray(np.zeros(cout, np.float32), dtype)

    C = cfg.channels
    params = {"in": conv(cfg.mel_bins, C, 5)}
    for i in range(cfg.num_blocks):
        params[f"block{i}_a"] = conv(C, C, 3)
        params[f"block{i}_b"] = conv(C, C, 3)
    params["attn"] = lin(C, 1)
    params["out"] = lin(2 * C, cfg.embedding_dim)
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def _speaker_forward(params, cfg: SpeakerEncoderConfig, mel: jax.Array, mask: jax.Array) -> jax.Array:
    """mel [1, T, n_mels], mask [1, T] -> x-vector [1, embedding_dim].

    Conv blocks with residuals, then attentive statistics pooling
    (mean + std under learned attention weights) and a linear projection —
    the standard x-vector recipe."""

    def conv(p, x, dil=1):
        w, b = p
        pad = (w.shape[0] - 1) * dil // 2
        y = jax.lax.conv_general_dilated(
            x, w, (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=jnp.float32,
        )
        return (y + b).astype(x.dtype)

    h = jax.nn.relu(conv(params["in"], mel))
    for i in range(cfg.num_blocks):
        r = jax.nn.relu(conv(params[f"block{i}_a"], h, dil=2**i))
        r = conv(params[f"block{i}_b"], r, dil=1)
        h = jax.nn.relu(h + r)
    # attentive stats pooling
    aw, ab = params["attn"]
    scores = (jnp.dot(h, aw) + ab)[..., 0]  # [1, T]
    scores = jnp.where(mask > 0, scores, -1e30)
    alpha = jax.nn.softmax(scores, axis=-1)[..., None]  # [1, T, 1]
    mean = jnp.sum(alpha * h, axis=1)
    var = jnp.sum(alpha * jnp.square(h - mean[:, None, :]), axis=1)
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-8))], axis=-1)
    ow, ob = params["out"]
    emb = jnp.dot(stats, ow) + ob
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


# ---------------------------------------------------------------------------
# Codec encoder (audio -> RVQ codes)
# ---------------------------------------------------------------------------


def init_encoder_params(seed: int, cfg: CodecConfig, dtype=jnp.float32) -> Dict:
    """Strided conv downsampler mirroring the decoder's upsample geometry."""
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k):
        w = rng.standard_normal((k, cin, cout), dtype=np.float32) / math.sqrt(cin * k)
        return jnp.asarray(w, dtype), jnp.asarray(np.zeros(cout, np.float32), dtype)

    dims = [32, 64, 128, 256]
    params = {"in": conv(1, dims[0], 7)}
    # strides reverse the decoder upsample_rates then upsampling_ratios
    strides = list(reversed(cfg.upsample_rates)) + list(reversed(cfg.upsampling_ratios))
    chans = dims + [cfg.hidden_size, cfg.hidden_size]
    cin = dims[0]
    for i, s in enumerate(strides):
        cout = chans[min(i + 1, len(chans) - 1)]
        params[f"down{i}"] = conv(cin, cout, 2 * s)
        cin = cout
    params["proj"] = conv(cin, cfg.hidden_size, 3)
    params["_strides"] = tuple(strides)  # structural; removed before jit use
    return params


@functools.partial(jax.jit, static_argnames=("strides",))
def _encode_latents(params, strides: Tuple[int, ...], audio: jax.Array) -> jax.Array:
    """audio [1, n, 1] -> latents [1, T, hidden] at the codec frame rate."""

    def conv(p, x, stride):
        w, b = p
        k = w.shape[0]
        x = jnp.pad(x, ((0, 0), (k - stride, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x, w, (stride,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        return (y + b).astype(x.dtype)

    h = jax.nn.gelu(conv(params["in"], audio, 1))
    for i, s in enumerate(strides):
        h = jax.nn.gelu(conv(params[f"down{i}"], h, s))
    return conv(params["proj"], h, 1)


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
        emb = _speaker_forward(
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
        enc = self.params["codec_encoder"]
        strides = enc["_strides"]
        enc_arrays = {k: v for k, v in enc.items() if k != "_strides"}
        latents = _encode_latents(enc_arrays, strides, jnp.asarray(wav.reshape(1, -1, 1)))
        codes = _rvq_encode(
            self.params["codec"]["code_embed"], latents, ccfg.num_quantizers, ccfg.codebook_size
        )
        return np.asarray(codes, np.int32)[0, :n_frames]
