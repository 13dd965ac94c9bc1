"""ctypes bindings for the native audio library (``native/birda_audio.cpp``).

The shared library is built by ``make -C native`` into this package directory.
If it is missing (fresh checkout without a toolchain), :data:`available` is
False and callers fall back to the pure-Python WAV reader in
:mod:`birda_tpu.audio.wav_fallback`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libbirda_audio.so"
_lib = None


def _try_build() -> bool:
    """Attempt an in-tree build of the native library (best effort)."""
    native_dir = Path(__file__).resolve().parents[2] / "native"
    if not (native_dir / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            capture_output=True, timeout=120, check=True,
        )
    except (subprocess.SubprocessError, OSError):
        return False
    return _LIB_PATH.exists()


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.birda_open.restype = ctypes.c_void_p
    lib.birda_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.birda_rate.restype = ctypes.c_int32
    lib.birda_rate.argtypes = [ctypes.c_void_p]
    lib.birda_channels.restype = ctypes.c_int32
    lib.birda_channels.argtypes = [ctypes.c_void_p]
    lib.birda_frames.restype = ctypes.c_int64
    lib.birda_frames.argtypes = [ctypes.c_void_p]
    lib.birda_read_mono.restype = ctypes.c_int64
    lib.birda_read_mono.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.birda_seek.restype = ctypes.c_int64
    lib.birda_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    if hasattr(lib, "birda_exact_seek"):
        lib.birda_exact_seek.restype = ctypes.c_int32
        lib.birda_exact_seek.argtypes = [ctypes.c_void_p]
    lib.birda_error.restype = ctypes.c_char_p
    lib.birda_error.argtypes = [ctypes.c_void_p]
    lib.birda_close.restype = None
    lib.birda_close.argtypes = [ctypes.c_void_p]
    lib.birda_quantize_int16.restype = None
    lib.birda_quantize_int16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float),
    ]
    lib.birda_write_wav16.restype = ctypes.c_int
    lib.birda_write_wav16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeReader:
    """Streaming mono reader over the native decoder."""

    def __init__(self, path: Path | str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native audio library unavailable")
        err = ctypes.create_string_buffer(256)
        self._h = lib.birda_open(str(path).encode(), err, 256)
        if not self._h:
            raise IOError(err.value.decode() or "open failed")
        self._lib = lib
        self.rate = lib.birda_rate(self._h)
        self.channels = lib.birda_channels(self._h)
        self.frames = lib.birda_frames(self._h)
        try:
            self.exact_seek = bool(lib.birda_exact_seek(self._h))
        except AttributeError:  # stale .so without the symbol
            self.exact_seek = False

    def read(self, n: int) -> np.ndarray:
        """Read up to ``n`` mono frames; empty array at EOF."""
        out = np.empty(n, np.float32)
        got = self._lib.birda_read_mono(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        if got < 0:
            raise IOError(self._lib.birda_error(self._h).decode() or "read failed")
        return out[:got]

    def seek(self, frame: int) -> int:
        pos = self._lib.birda_seek(self._h, frame)
        if pos < 0:
            raise IOError(self._lib.birda_error(self._h).decode() or "seek failed")
        return pos

    def close(self):
        if self._h:
            self._lib.birda_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_wav16(path: Path | str, samples: np.ndarray, rate: int) -> None:
    """Write mono float32 samples as 16-bit PCM WAV via the native writer."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    samples = np.ascontiguousarray(samples, np.float32)
    err = ctypes.create_string_buffer(256)
    rc = lib.birda_write_wav16(
        str(path).encode(),
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples), rate, err, 256,
    )
    if rc != 0:
        raise IOError(err.value.decode() or "wav write failed")


def quantize_int16(samples: np.ndarray) -> tuple[np.ndarray, float]:
    """Fused amax + int16 quantization in native code (one pass each,
    auto-vectorized). Returns (int16 payload, amax scale)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    samples = np.ascontiguousarray(samples, np.float32)
    out = np.empty(len(samples), np.int16)
    amax = ctypes.c_float(0.0)
    lib.birda_quantize_int16(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.byref(amax),
    )
    return out, float(amax.value)
