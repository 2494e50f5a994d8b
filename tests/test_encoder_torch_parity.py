"""Torch parity for the reference-audio encoders (VERDICT r2 missing #3,
r3 next #7).

The upstream voice-reference pipeline (codec encoder + x-vector speaker
encoder behind `create_voice_clone_prompt`, reference model.py:429-451):

- speaker encoder: validated against **the actual public Qwen module** —
  `transformers.models.qwen2_5_omni.modeling_qwen2_5_omni.ECAPA_TimeDelayNet`
  (Qwen's own x-vector encoder, shipped in this environment's transformers).
  Its real state_dict names flow through `weights.load_hf_checkpoint`
  (strict) and its torch forward is the numeric oracle, so both the name
  map and the math are pinned to public Qwen code, not to a re-statement.
- codec encoder: the structural **mirror of Code2Wav** — causal conv stem,
  snake-beta residual units + strided downsample blocks, ConvNeXt stages,
  sliding-window RMSNorm transformer. Its conv/transformer primitives are
  the SAME code paths the torch-validated codec decoder runs
  (tests/test_hf_import.py::test_codec_matches_torch_code2wav), so this test
  pins the encoder-side composition and the name map. (No public torch
  module exists for the Qwen3-TTS tokenizer ENCODER — transformers ships
  only the Code2Wav decoder — so this half keeps the re-statement oracle.)

Flow per test: build the torch model at small geometry, export state_dict
under the upstream names, import through `weights.load_hf_checkpoint`
(name map + layout transposes under test), and assert forward parity vs
the JAX module.
"""
import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from faster_qwen3_tts_tpu import weights as weights_lib
from faster_qwen3_tts_tpu.config import (
    CodecConfig, PredictorConfig, Qwen3TTSConfig, SpeakerEncoderConfig, TalkerConfig,
)
from faster_qwen3_tts_tpu.models import voice_extract as vx


# --------------------------------------------------------------------------
# Speaker encoder vs transformers' public Qwen ECAPA_TimeDelayNet
# --------------------------------------------------------------------------

SPK_CFG = SpeakerEncoderConfig(
    mel_bins=20, channels=32, embedding_dim=48, num_blocks=3,
    res2net_scale=4, se_channels=12, attention_channels=24, mfa_dim=96,
)


def _public_ecapa(cfg: SpeakerEncoderConfig):
    """Instantiate transformers' ECAPA_TimeDelayNet at this geometry."""
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniDiTConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        ECAPA_TimeDelayNet,
    )

    C, n = cfg.channels, cfg.num_blocks
    assert cfg.mfa_dim == n * C, "public MFA concat requires mfa_dim == num_blocks*channels"
    dit = Qwen2_5OmniDiTConfig(
        mel_dim=cfg.mel_bins,
        enc_dim=cfg.embedding_dim,
        enc_channels=[C] * (n + 1) + [cfg.mfa_dim],
        enc_kernel_sizes=[5] + [3] * n + [1],
        enc_dilations=[1] + list(range(2, 2 + n)) + [1],
        enc_attention_channels=cfg.attention_channels,
        enc_res2net_scale=cfg.res2net_scale,
        enc_se_channels=cfg.se_channels,
    )
    return ECAPA_TimeDelayNet(dit).eval().float()


def _randomize(module, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    with torch.no_grad():
        for k, v in sd.items():
            if k.endswith("running_var"):
                sd[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.75
            elif k.endswith("num_batches_tracked"):
                continue
            elif k.endswith("running_mean"):
                sd[k] = torch.randn(v.shape, generator=g) * scale
            else:
                sd[k] = torch.randn(v.shape, generator=g) * scale
    module.load_state_dict(sd)
    return module


def _tts_config(spk=SPK_CFG, codec=None):
    return Qwen3TTSConfig(
        talker=TalkerConfig(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            num_key_value_heads=1, head_dim=16, intermediate_size=48,
            vocab_size=3072, text_vocab_size=64, text_hidden_size=16,
        ),
        predictor=PredictorConfig(
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            num_key_value_heads=1, head_dim=8, intermediate_size=32,
            vocab_size=64,
        ),
        codec=codec or CodecConfig(),
        speaker_encoder=spk,
    )


def _export_and_load(tm, prefix, cfg, tmp_path, submodel):
    from safetensors.torch import save_file as save_pt

    sd = {
        f"{prefix}{k}": v.contiguous().float()
        for k, v in tm.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }
    save_pt(sd, os.path.join(str(tmp_path), "model.safetensors"))
    return weights_lib.load_hf_checkpoint(
        str(tmp_path), cfg, dtype=jnp.float32, strict=True,
        submodels=(submodel,), device_put=False,
    )


def test_speaker_encoder_matches_public_qwen_ecapa(tmp_path):
    """Name map + forward math vs the REAL transformers ECAPA_TimeDelayNet
    at exact length (how upstream always runs it)."""
    tm = _randomize(_public_ecapa(SPK_CFG))
    cfg = _tts_config()
    loaded = _export_and_load(tm, "speaker_encoder.", cfg, tmp_path, "speaker_encoder")

    rng = np.random.default_rng(0)
    T = 37
    mel = rng.standard_normal((1, T, SPK_CFG.mel_bins)).astype(np.float32)
    mask = np.ones((1, T), np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(mel)).numpy()
    got = np.asarray(
        vx.speaker_forward(
            loaded["speaker_encoder"], SPK_CFG, jnp.asarray(mel), jnp.asarray(mask)
        )
    )
    assert want.shape == got.shape == (1, SPK_CFG.embedding_dim)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("Tpad", [40, 64])
def test_speaker_bucket_padding_exactness(tmp_path, Tpad):
    """Bucket right-padding must reproduce the torch EXACT-length forward —
    this needs the reflect-continuation pad (voice_extract._reflect_pad),
    not just masked statistics, because upstream's convs reflect-pad at the
    true end of the signal. Tpad=40 exercises the corner where the conv
    halo (pad<=4) crosses the bucket edge (L=37 > Tpad-4)."""
    tm = _randomize(_public_ecapa(SPK_CFG))
    cfg = _tts_config()
    loaded = _export_and_load(tm, "speaker_encoder.", cfg, tmp_path, "speaker_encoder")
    rng = np.random.default_rng(1)
    T = 37
    base = rng.standard_normal((1, T, SPK_CFG.mel_bins)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(base)).numpy()
    mel = np.zeros((1, Tpad, SPK_CFG.mel_bins), np.float32)
    mel[0, :T] = base[0]
    mask = np.zeros((1, Tpad), np.float32)
    mask[0, :T] = 1.0
    got = np.asarray(vx.speaker_forward(
        loaded["speaker_encoder"], SPK_CFG, jnp.asarray(mel), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


# --------------------------------------------------------------------------
# Torch mirror-of-Code2Wav encoder re-statement
# --------------------------------------------------------------------------


class CausalConv(nn.Module):
    """torch re-statement of models/codec.causal_conv1d's padding rule."""

    def __init__(self, cin, cout, k, stride=1, dilation=1, groups=1):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, stride=stride, dilation=dilation,
                              groups=groups)
        self.stride, self.dilation = stride, dilation

    def forward(self, x):  # [B, C, T]
        k = self.conv.kernel_size[0]
        k_eff = (k - 1) * self.dilation + 1
        pad_left = k_eff - self.stride
        length = x.shape[2]
        n_frames = (length - k_eff + pad_left) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (k_eff - pad_left)
        extra = int(ideal - length)
        return self.conv(F.pad(x, (pad_left, max(extra, 0))))


class Snake(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.alpha = nn.Parameter(torch.zeros(dim))
        self.beta = nn.Parameter(torch.zeros(dim))

    def forward(self, x):  # [B, C, T]
        a = self.alpha.exp()[None, :, None]
        b = self.beta.exp()[None, :, None] + 1e-9
        return x + torch.sin(x * a) ** 2 / b


class ResUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        self.act1 = Snake(dim)
        self.conv1 = CausalConv(dim, dim, 7, dilation=dilation)
        self.act2 = Snake(dim)
        self.conv2 = CausalConv(dim, dim, 1)

    def forward(self, x):
        return x + self.conv2(self.act2(self.conv1(self.act1(x))))


class EncBlock(nn.Module):
    def __init__(self, cin, cout, rate):
        super().__init__()
        self.block = nn.ModuleList(
            [ResUnit(cin, d) for d in (1, 3, 9)]
            + [Snake(cin), CausalConv(cin, cout, 2 * rate, stride=rate)]
        )

    def forward(self, x):
        for m in self.block:
            x = m(x)
        return x


class ConvNeXt(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = CausalConv(dim, dim, 7, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):  # [B, C, T]
        h = self.dwconv(x).transpose(1, 2)
        h = self.norm(h)
        h = self.pwconv2(F.gelu(self.pwconv1(h)))
        return x + (self.gamma * h).transpose(1, 2)


class RMSNorm(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.pow(2).mean(dim=-1, keepdim=True)
        return self.weight * x * torch.rsqrt(var + self.eps)


class PreLayer(nn.Module):
    def __init__(self, cfg: CodecConfig):
        super().__init__()
        C, H, D = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim
        self.self_attn = nn.Module()
        self.self_attn.q_proj = nn.Linear(C, H * D, bias=False)
        self.self_attn.k_proj = nn.Linear(C, cfg.num_key_value_heads * D, bias=False)
        self.self_attn.v_proj = nn.Linear(C, cfg.num_key_value_heads * D, bias=False)
        self.self_attn.o_proj = nn.Linear(H * D, C, bias=False)
        self.mlp = nn.Module()
        self.mlp.gate_proj = nn.Linear(C, cfg.intermediate_size, bias=False)
        self.mlp.up_proj = nn.Linear(C, cfg.intermediate_size, bias=False)
        self.mlp.down_proj = nn.Linear(cfg.intermediate_size, C, bias=False)
        self.input_layernorm = RMSNorm(C, cfg.rms_norm_eps)
        self.post_attention_layernorm = RMSNorm(C, cfg.rms_norm_eps)
        self.self_attn_layer_scale = nn.Module()
        self.self_attn_layer_scale.scale = nn.Parameter(
            torch.full((C,), cfg.layer_scale_initial_scale))
        self.mlp_layer_scale = nn.Module()
        self.mlp_layer_scale.scale = nn.Parameter(
            torch.full((C,), cfg.layer_scale_initial_scale))
        self.cfg = cfg

    def forward(self, x, cos, sin, mask):  # x [B, T, C]
        cfg = self.cfg
        B, T, C = x.shape
        H, D = cfg.num_attention_heads, cfg.head_dim
        h = self.input_layernorm(x)
        q = self.self_attn.q_proj(h).view(B, T, H, D)
        k = self.self_attn.k_proj(h).view(B, T, -1, D)
        v = self.self_attn.v_proj(h).view(B, T, -1, D)

        def rope(t):
            half = D // 2
            t1, t2 = t[..., :half], t[..., half:]
            rot = torch.cat([-t2, t1], dim=-1)
            return t * cos[:, :, None, :] + rot * sin[:, :, None, :]

        q, k = rope(q), rope(k)
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) * D**-0.5
        scores = scores.masked_fill(~mask, -1e30)
        probs = torch.softmax(scores, dim=-1)
        attn = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * D)
        x = x + self.self_attn_layer_scale.scale * self.self_attn.o_proj(attn)
        h = self.post_attention_layernorm(x)
        mlp = self.mlp.down_proj(F.silu(self.mlp.gate_proj(h)) * self.mlp.up_proj(h))
        return x + self.mlp_layer_scale.scale * mlp


class PreTransformer(nn.Module):
    def __init__(self, cfg: CodecConfig):
        super().__init__()
        self.layers = nn.ModuleList([PreLayer(cfg) for _ in range(cfg.num_hidden_layers)])
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps)
        self.cfg = cfg

    def forward(self, x):  # [B, T, C]
        cfg = self.cfg
        T, D = x.shape[1], cfg.head_dim
        pos = torch.arange(T, dtype=torch.float32)
        half = D // 2
        inv = 1.0 / (cfg.rope_theta ** (torch.arange(half, dtype=torch.float32) / half))
        freqs = pos[:, None] * inv[None, :]
        emb = torch.cat([freqs, freqs], dim=-1)
        cos, sin = emb.cos()[None], emb.sin()[None]
        qpos, kpos = torch.arange(T)[:, None], torch.arange(T)[None, :]
        mask = ((kpos <= qpos) & (kpos > qpos - cfg.sliding_window))[None, None]
        for layer in self.layers:
            x = layer(x, cos, sin, mask)
        return self.norm(x)


class TorchCodecEncoder(nn.Module):
    """Mirror-of-Code2Wav encoder, module names == the declared name map."""

    def __init__(self, cfg: CodecConfig):
        super().__init__()
        dims = vx.encoder_dims(cfg)
        enc = [CausalConv(1, dims[0], 7)]
        for i, rate in enumerate(reversed(cfg.upsample_rates)):
            enc.append(EncBlock(dims[i], dims[i + 1], rate))
        enc.append(CausalConv(dims[-1], cfg.hidden_size, 7))
        self.encoder = nn.ModuleList(enc)
        self.downsample = nn.ModuleList()
        for factor in reversed(cfg.upsampling_ratios):
            stage = nn.ModuleList(
                [ConvNeXt(cfg.hidden_size),
                 CausalConv(cfg.hidden_size, cfg.hidden_size, 2 * factor, stride=factor)]
            )
            self.downsample.append(stage)
        self.pre_transformer = PreTransformer(cfg)

    def forward(self, audio):  # [B, n] -> [B, T, C]
        x = audio[:, None, :]
        for m in self.encoder:
            x = m(x)
        for stage in self.downsample:
            x = stage[1](stage[0](x))
        return self.pre_transformer(x.transpose(1, 2))


CODEC_CFG = CodecConfig(
    codebook_size=32, num_quantizers=4, hidden_size=16, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=2, head_dim=8,
    intermediate_size=32, sliding_window=6, upsampling_ratios=(2, 2),
    upsample_rates=(8, 5, 4, 3), decoder_dim=32,
)


def test_codec_encoder_matches_torch_mirror(tmp_path):
    tm = _randomize(TorchCodecEncoder(CODEC_CFG).eval().float(), seed=3, scale=0.05)
    cfg = _tts_config(codec=CODEC_CFG)
    loaded = _export_and_load(
        tm, "speech_tokenizer.encoder.", cfg, tmp_path, "codec_encoder"
    )
    rng = np.random.default_rng(2)
    n = CODEC_CFG.total_upsample * 8
    audio = (rng.standard_normal(n) * 0.1).astype(np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(audio)[None]).numpy()
    got = np.asarray(
        vx.encode_latents(
            loaded["codec_encoder"], CODEC_CFG, jnp.asarray(audio.reshape(1, -1, 1))
        )
    )
    assert got.shape == want.shape == (1, 8, CODEC_CFG.hidden_size)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=2e-3)


def test_rvq_round_trip_shape(tmp_path):
    """encode -> RVQ codes land in range and round-trip through the decoder
    embedding space (structure check; real weights sharpen this)."""
    from faster_qwen3_tts_tpu.models import codec as codec_lib

    cfg = _tts_config(codec=CODEC_CFG)
    enc = vx.init_encoder_params(0, CODEC_CFG)
    dec = codec_lib.init_params(1, CODEC_CFG)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(CODEC_CFG.total_upsample * 4) * 0.1).astype(np.float32)
    lat = vx.encode_latents(enc, CODEC_CFG, jnp.asarray(audio.reshape(1, -1, 1)))
    codes = vx._rvq_encode(
        dec["code_embed"], lat, CODEC_CFG.num_quantizers, CODEC_CFG.codebook_size
    )
    assert codes.shape == (1, 4, CODEC_CFG.num_quantizers)
    assert int(jnp.min(codes)) >= 0
    assert int(jnp.max(codes)) < CODEC_CFG.codebook_size
