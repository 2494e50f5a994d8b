"""Fused decode+vocode streaming chunk: AR frames AND waveform in ONE dispatch.

The reference's streaming pipeline alternates host round trips: decode chunk
-> fetch tokens -> dispatch codec decode -> fetch audio (reference
streaming.py + model.py:1079-1137). On TPU each round trip costs real
latency, so the steady-state path here fuses the whole chunk — talker scan,
predictor loops, sampling, AND the 25-frame-left-context codec window decode —
into a single jitted executable that returns one packed array (audio +
tokens + flags) per chunk.

Sample alignment: a window of (ctx + chunk) frames decodes to
(ctx+chunk)*up - D samples (D = the decoder's fixed trans-conv trim deficit).
Emitting window-local samples [ctx*up - D : (ctx+chunk)*up - D) makes chunk
outputs EXACTLY contiguous in absolute sample coordinates — a sample-exact
improvement over the reference's calibrated proportional slicing
(model.py:1108-1135), with every emitted sample computed from >= ctx-2 frames
of real left context.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CodecConfig, PredictorConfig, TalkerConfig
from ..models import codec as codec_lib
from ..ops.sampling import SamplingParams
from . import aot, core


def codec_deficit(cfg: CodecConfig) -> int:
    """Fixed sample deficit of the decoder geometry: T frames -> T*up - D."""
    n = 1
    for r in cfg.upsampling_ratios:
        n *= r
    D = 0
    for r in cfg.upsample_rates:
        D = (D + 1) * r
        n *= r
    # decode length for T frames: n*T - D  (derived from L -> (L-1)*r per block)
    return D


@functools.partial(
    jax.jit,
    static_argnames=("talker_cfg", "codec_cfg", "chunk_size", "ctx"),
    donate_argnames=("hist",),
)
def _vocode_window(
    codec_params,
    talker_cfg: TalkerConfig,
    codec_cfg: CodecConfig,
    hist: jax.Array,  # [B, ctx, 16] (ignored when ctx == 0)
    packed: jax.Array,  # [chunk, B, 18] from core.decode_chunk
    chunk_size: int,
    ctx: int,
) -> Tuple[jax.Array, jax.Array]:
    """Window vocode + single-fetch packing. Returns (new_hist, flat) with
    flat = [audio (B*chunk*up) | bitcast packed | emitted]."""
    frames = jnp.transpose(packed[:, :, : talker_cfg.num_code_groups], (1, 0, 2))
    window = jnp.concatenate([hist, frames], axis=1) if ctx > 0 else frames
    wav = codec_lib.decode_frames(codec_params, codec_cfg, window)
    up = codec_cfg.total_upsample
    D = codec_deficit(codec_cfg)
    start = ctx * up - D
    if start < 0:  # ctx == 0 (first chunk): emit from 0, short by D samples
        audio = wav[:, : chunk_size * up - D]
        audio = jnp.pad(audio, ((0, 0), (0, D)))  # fixed length chunk*up
        emitted = chunk_size * up - D
    else:
        audio = jax.lax.dynamic_slice_in_dim(wav, start, chunk_size * up, axis=1)
        emitted = chunk_size * up
    new_hist = window[:, -max(ctx, 1) :]
    # Token/flag metadata rides as exact f32 VALUES (all < 2^24), NOT as an
    # int32->f32 bitcast: small int bit patterns are f32 denormals, and TPU
    # compute units flush denormals to zero — a bitcast transport silently
    # zeroed every token and valid flag on hardware (CPU tests passed).
    flat = jnp.concatenate(
        [
            audio.reshape(-1).astype(jnp.float32),
            packed.reshape(-1).astype(jnp.float32),
            jnp.full((1,), float(emitted), jnp.float32),
        ]
    )
    return new_hist, flat


def decode_chunk_fused(
    talker_params,
    pred_params,
    codec_params,
    talker_cfg: TalkerConfig,
    pred_cfg: PredictorConfig,
    codec_cfg: CodecConfig,
    state: core.DecodeState,
    hist: jax.Array,
    trailing_text: jax.Array,
    tts_pad_embed: jax.Array,
    chunk_size: int,
    ctx: int,
    sampling: SamplingParams,
    pred_sampling: SamplingParams,
    min_new_tokens: int,
) -> Tuple[core.DecodeState, jax.Array, jax.Array]:
    """One fused streaming step: AR chunk + window vocode chained DEVICE-SIDE
    (two async dispatches, zero host syncs, one eventual fetch).

    Deliberately two executables rather than one mega-jit: the combined HLO
    (talker scan + predictor loops + full codec) takes the XLA TPU compiler
    an order of magnitude longer to compile for no runtime win (there is no
    cross-executable fusion to exploit; dispatch overhead hides behind device
    compute because the dispatches are async).
    """
    state, packed = aot.call(
        "decode_chunk",
        core.decode_chunk,
        talker_params=talker_params,
        pred_params=pred_params,
        talker_cfg=talker_cfg,
        pred_cfg=pred_cfg,
        state=state,
        trailing_text=trailing_text,
        tts_pad_embed=tts_pad_embed,
        chunk_size=chunk_size,
        sampling=sampling,
        pred_sampling=pred_sampling,
        min_new_tokens=min_new_tokens,
    )
    new_hist, flat = aot.call(
        "vocode_window",
        _vocode_window,
        codec_params=codec_params,
        talker_cfg=talker_cfg,
        codec_cfg=codec_cfg,
        hist=hist,
        packed=packed,
        chunk_size=chunk_size,
        ctx=ctx,
    )
    return state, new_hist, flat


def split_fused_output(flat, chunk_size: int, batch: int, num_code_groups: int, up: int):
    """Host-side unpack of the fused output -> (audio [B, chunk*up] f32,
    frames [n,16] int32, done bool, emitted_samples int)."""
    import numpy as np

    arr = np.asarray(flat)
    n_audio = batch * chunk_size * up
    audio = arr[:n_audio].reshape(batch, chunk_size * up)
    meta = arr[n_audio:-1].astype(np.int32).reshape(chunk_size, batch, num_code_groups + 2)
    emitted = int(arr[-1])
    valid = meta[:, 0, -2].astype(bool)
    done = bool(meta[0, 0, -1])
    frames = meta[valid, 0, :-2].astype(np.int32)
    return audio, frames, done, emitted


def split_fused_output_batch(flat, chunk_size: int, batch: int, num_code_groups: int, up: int):
    """Batched unpack of the fused output, keeping every slot's lane:
    (audio [B, chunk*up] f32, frames [chunk, B, 16] int32,
    valid [chunk, B] bool, done [B] bool)."""
    import numpy as np

    arr = np.asarray(flat)
    n_audio = batch * chunk_size * up
    audio = arr[:n_audio].reshape(batch, chunk_size * up)
    meta = arr[n_audio:-1].astype(np.int32).reshape(chunk_size, batch, num_code_groups + 2)
    frames = meta[:, :, :-2].astype(np.int32)
    valid = meta[:, :, -2].astype(bool)
    done = meta[0, :, -1].astype(bool)
    return audio, frames, valid, done
