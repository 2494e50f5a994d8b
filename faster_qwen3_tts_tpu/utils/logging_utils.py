"""Logging helpers: noisy-warning suppression + timing-dict formatting.

Counterpart of reference utils.py:19-30 (`suppress_flash_attn_warning`): the
equivalent nag in this stack is the experimental-platform warning emitted at
JAX plugin registration, plus absl/XLA chatter on every fresh process.
"""
from __future__ import annotations

import contextlib
import logging
from typing import Any, Dict


@contextlib.contextmanager
def suppress_platform_warnings():
    """Silence the experimental-platform / plugin-registration warnings that
    upstream libraries print on import (cosmetic only)."""
    targets = ["jax._src.xla_bridge", "absl"]
    saved = {}
    for name in targets:
        lg = logging.getLogger(name)
        saved[name] = lg.level
        lg.setLevel(logging.ERROR)
    try:
        yield
    finally:
        for name, level in saved.items():
            logging.getLogger(name).setLevel(level)


def format_timing(timing: Dict[str, Any], frame_rate: float = 12.5) -> str:
    """Render a generation timing dict (reference generate.py:204-211 keys)
    as the reference's log line format (model.py:945-948)."""
    steps = timing.get("steps", 0)
    audio_s = steps / frame_rate
    total = timing.get("prefill_ms", 0.0) / 1000.0 + timing.get("decode_s", 0.0)
    rtf = audio_s / total if total > 0 else 0.0
    return (
        f"Generated {audio_s:.2f}s audio in {total:.2f}s "
        f"({timing.get('ms_per_step', 0.0):.1f}ms/step, RTF: {rtf:.2f})"
    )


def enable_profiler_trace(logdir: str):
    """Start a jax.profiler trace (TPU timeline) — the deeper-observability
    hook the reference lacks (SURVEY §5 'tracing': wall-clock dicts only).

    Usage:
        with enable_profiler_trace("/tmp/trace"):
            model.generate_voice_clone(...)
    """
    import jax

    return jax.profiler.trace(logdir)
