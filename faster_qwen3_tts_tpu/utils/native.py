"""ctypes bindings for the native host library (native/libfq3t.so).

Loads the C++ DSP/IO library when built (`make -C native`); every entry point
has a numpy fallback so the framework runs without the native build. The
ctypes-wrapper pattern mirrors how the reference consumes its native runtime
(reference ggml_backend.py:31-39).
"""
from __future__ import annotations

import ctypes
import logging
import os
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _candidates():
    root = Path(__file__).resolve().parent.parent.parent
    yield os.environ.get("FQ3T_NATIVE_LIB") or ""
    yield str(root / "native" / "libfq3t.so")
    yield "libfq3t.so"


def _ensure_built() -> None:
    """Build (or rebuild) the repo-local library from source.

    The .so is NOT committed; it is compiled on first use so the binary can
    never drift stale behind fq3t.cpp — `make` rebuilds iff the source is
    newer. Failure is fine: every entry point has a numpy fallback.
    """
    if os.environ.get("FQ3T_NO_NATIVE_BUILD") == "1":
        return
    native_dir = Path(__file__).resolve().parent.parent.parent / "native"
    src = native_dir / "fq3t.cpp"
    if not src.exists():
        return  # installed package without the source tree
    so = native_dir / "libfq3t.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            capture_output=True, timeout=120, check=True,
        )
        logger.info("built native libfq3t from source")
    except Exception as e:
        logger.info("native build unavailable (%s); using numpy fallbacks", e)


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    _ensure_built()
    for path in _candidates():
        if not path:
            continue
        try:
            lib = ctypes.CDLL(path)
            if lib.fq3t_abi_version() != 1:
                logger.warning("libfq3t ABI mismatch at %s", path)
                continue
            lib.fq3t_resample.restype = ctypes.c_int64
            lib.fq3t_resample_out_len.restype = ctypes.c_int64
            lib.fq3t_float_to_pcm16.restype = ctypes.c_int64
            lib.fq3t_write_wav.restype = ctypes.c_int32
            lib.fq3t_ring_new.restype = ctypes.c_void_p
            lib.fq3t_ring_write.restype = ctypes.c_int64
            lib.fq3t_ring_read.restype = ctypes.c_int64
            lib.fq3t_ring_available.restype = ctypes.c_int64
            _LIB = lib
            logger.info("loaded native libfq3t from %s", path)
            break
        except OSError:
            continue
    return _LIB


def available() -> bool:
    return load_library() is not None


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Windowed-sinc polyphase resample (native), numpy/scipy fallback."""
    lib = load_library()
    if lib is None:
        from . import audio as audio_lib

        return audio_lib.resample(audio, sr_in, sr_out)
    x = np.ascontiguousarray(audio, np.float32)
    n_out = lib.fq3t_resample_out_len(len(x), sr_in, sr_out)
    out = np.empty(n_out, np.float32)
    produced = lib.fq3t_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sr_in, sr_out, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:produced]


def float_to_pcm16(audio: np.ndarray) -> bytes:
    lib = load_library()
    x = np.ascontiguousarray(audio, np.float32)
    if lib is None:
        from . import audio as audio_lib

        return audio_lib.float_to_pcm16(x)
    out = np.empty(len(x), "<i2")
    lib.fq3t_float_to_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out.tobytes()


def write_wav(path, audio: np.ndarray, sample_rate: int) -> None:
    lib = load_library()
    if lib is None:
        from . import audio as audio_lib

        audio_lib.write_wav(path, audio, sample_rate)
        return
    x = np.ascontiguousarray(audio, np.float32)
    rc = lib.fq3t_write_wav(
        str(path).encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), sample_rate,
    )
    if rc != 0:
        raise IOError(f"fq3t_write_wav failed for {path}")


class RingBuffer:
    """SPSC float ring buffer backed by the native library (numpy fallback)."""

    def __init__(self, capacity: int):
        self._lib = load_library()
        if self._lib is not None:
            self._h = ctypes.c_void_p(self._lib.fq3t_ring_new(capacity))
            self._buf = None
        else:
            self._h = None
            self._buf = np.zeros(0, np.float32)
        self.capacity = capacity

    def write(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, np.float32)
        if self._h is not None:
            return int(
                self._lib.fq3t_ring_write(
                    self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(data)
                )
            )
        take = min(len(data), self.capacity - len(self._buf))
        self._buf = np.concatenate([self._buf, data[:take]])
        return take

    def read(self, n: int) -> np.ndarray:
        if self._h is not None:
            out = np.empty(n, np.float32)
            got = int(
                self._lib.fq3t_ring_read(
                    self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
                )
            )
            return out[:got]
        got = self._buf[:n]
        self._buf = self._buf[n:]
        return got

    def available(self) -> int:
        if self._h is not None:
            return int(self._lib.fq3t_ring_available(self._h))
        return len(self._buf)

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.fq3t_ring_free(self._h)
