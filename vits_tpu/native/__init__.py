"""ctypes bindings for the native data-loading core (libvitsdataio.so).

Build with `make -C vits_tpu/native`. Every function has a numpy fallback in
vits_tpu.utils.audio / vits_tpu.train.data, selected automatically when the
shared object is absent (`available()` is False).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libvitsdataio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vits_bin_size.restype = ctypes.c_long
    lib.vits_bin_size.argtypes = [ctypes.c_char_p]
    lib.vits_read_bin.restype = ctypes.c_long
    lib.vits_read_bin.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.vits_wav_samples.restype = ctypes.c_long
    lib.vits_wav_samples.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.vits_read_wav.restype = ctypes.c_long
    lib.vits_read_wav.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_long, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.vits_frame_signal.restype = ctypes.c_long
    lib.vits_frame_signal.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                                      ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                                      ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_long]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_bin(path: str, dim: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = lib.vits_bin_size(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty(n, dtype=np.float32)
    got = lib.vits_read_bin(path.encode(), _fptr(out), n)
    return out[:got].reshape(-1, dim)


def wav_samples(path: str) -> Optional[Tuple[int, int]]:
    """(n_mono_samples, sample_rate) without decoding the payload."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    n = lib.vits_wav_samples(path.encode(), ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"bad wav: {path}")
    return int(n), int(sr.value)


def read_wav_norm(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Peak-normalized mono float32 decode (utils.load_wav_to_torch parity)."""
    lib = _load()
    if lib is None:
        return None
    meta = wav_samples(path)
    if meta is None:
        return None
    n, _ = meta
    out = np.empty(max(n, 1), dtype=np.float32)
    sr = ctypes.c_int(0)
    got = lib.vits_read_wav(path.encode(), _fptr(out), n, ctypes.byref(sr), 1)
    if got < 0:
        raise ValueError(f"bad wav: {path}")
    return out[:got], int(sr.value)


def frame_signal(x: np.ndarray, window: np.ndarray, n_fft: int, hop: int) -> Optional[np.ndarray]:
    """Reflect-padded framed+windowed view for spectrogram computation."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    window = np.ascontiguousarray(window, dtype=np.float32)
    pad = (n_fft - hop) // 2
    max_frames = (len(x) + 2 * pad - n_fft) // hop + 1
    out = np.empty((max(max_frames, 0), n_fft), dtype=np.float32)
    got = lib.vits_frame_signal(_fptr(x), len(x), _fptr(window), n_fft, hop,
                                _fptr(out), max_frames)
    if got < 0:
        return None
    return out[:got]
