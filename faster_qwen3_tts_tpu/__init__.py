"""faster-qwen3-tts-tpu: TPU-native real-time Qwen3-TTS inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`andimarafioti/faster-qwen3-tts` (reference mounted at /root/reference),
designed TPU-first: fixed-shape jitted decode steps instead of CUDA graphs,
donated static KV caches instead of `transformers.StaticCache`, fused
on-device chunked decode loops instead of per-step host syncs.
"""

from .config import (
    CodecConfig,
    PredictorConfig,
    Qwen3TTSConfig,
    SpeakerEncoderConfig,
    TalkerConfig,
    get_config,
)

__version__ = "0.1.0"

__all__ = [
    "CodecConfig",
    "PredictorConfig",
    "Qwen3TTSConfig",
    "SpeakerEncoderConfig",
    "TalkerConfig",
    "get_config",
    "FasterQwen3TTS",
    "__version__",
]


def __getattr__(name):
    # Lazy: importing the full model stack pulls in jax device init.
    if name == "FasterQwen3TTS":
        from .model import FasterQwen3TTS

        return FasterQwen3TTS
    if name == "NativeQwen3TTS":
        from .native_backend import NativeQwen3TTS

        return NativeQwen3TTS
    raise AttributeError(name)
