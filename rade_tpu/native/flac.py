"""ctypes wrapper around the native FLAC decoder (flacdec.cpp)."""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Tuple

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is None:
        from .build import build

        build()
        lib = ctypes.CDLL(str(Path(__file__).parent / "librade_flac.so"))
        lib.flac_stream_info.restype = ctypes.c_int
        lib.flac_stream_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.flac_decode.restype = ctypes.c_int64
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        _LIB = lib
    return _LIB


def stream_info(data: bytes) -> Tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, total_samples)"""
    lib = _load()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bps = ctypes.c_int()
    total = ctypes.c_int64()
    rc = lib.flac_stream_info(data, len(data), sr, ch, bps, total)
    if rc != 0:
        raise ValueError("not a valid FLAC stream")
    return sr.value, ch.value, bps.value, total.value


def decode_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode FLAC bytes -> (float64 mono waveform in [-1, 1), sample_rate)."""
    lib = _load()
    sr, ch, bps, total = stream_info(data)
    if total == 0:
        total = len(data)  # unknown length: upper-bound by compressed size
    cap = (total + 65536) * ch
    out = np.empty(cap, dtype=np.int32)
    n = lib.flac_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap
    )
    if n <= 0:
        raise ValueError(f"FLAC decode failed (code {n})")
    pcm = out[: n * ch].reshape(n, ch).astype(np.float64)
    if ch > 1:
        pcm = pcm.mean(axis=1)
    else:
        pcm = pcm[:, 0]
    return pcm / float(1 << (bps - 1)), sr


def decode_file(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return decode_bytes(f.read())
