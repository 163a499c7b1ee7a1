"""ctypes wrapper around the native batched audio loader (loader.cpp).

``batch_load(paths, T)`` reads + decodes + pads a whole batch of FLAC/WAV
files in a C++ thread pool (no GIL, no per-item Python), writing directly
into one (N, T) float32 array — the TPU-native replacement for the
reference's torch DataLoader worker processes
(``/root/reference/src/main.py:914-953``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None

NATIVE_EXTS = (".flac", ".wav")  # formats loader.cpp decodes natively


def default_threads() -> int:
    env = os.environ.get("RADE_LOADER_THREADS")
    if env:
        return max(1, int(env))
    return max(2, min(16, os.cpu_count() or 4))


def _load():
    global _LIB
    if _LIB is None:
        from .build import build

        build()
        lib = ctypes.CDLL(str(Path(__file__).parent / "librade_loader.so"))
        lib.rade_batch_load.restype = ctypes.c_int64
        lib.rade_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.flac_encode16.restype = ctypes.c_int64
        lib.flac_encode16.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        _LIB = lib
    return _LIB


def encode_flac16(
    x: np.ndarray, sample_rate: int = 16000, blocksize: int = 4096
) -> bytes:
    """Encode a mono waveform (float in [-1,1] or int16) to FLAC bytes.

    Fixed-predictor FLAC via flacenc.cpp — fast enough to synthesize
    LA-scale datasets (25k utterances) in seconds, for pipeline benchmarks
    at real size.
    """
    lib = _load()
    if np.issubdtype(np.asarray(x).dtype, np.floating):
        pcm = np.ascontiguousarray(
            np.clip(np.asarray(x, np.float64), -1.0, 1.0) * 32767.0
        ).astype("<i2")
    else:
        pcm = np.ascontiguousarray(x, dtype="<i2")
    n = pcm.shape[0]
    cap = 64 + 3 * n + 16 * (n // blocksize + 2)
    out = np.empty(cap, dtype=np.uint8)
    got = lib.flac_encode16(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n,
        int(sample_rate), int(blocksize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if got <= 0:
        raise RuntimeError(f"flac_encode16 failed: {got}")
    return out[:got].tobytes()


def batch_load(
    paths: Sequence[str],
    T: int,
    u_starts: Optional[np.ndarray] = None,
    threads: Optional[int] = None,
    lenient: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load a batch of audio files -> ((N, T) float32, (N,) int64 lengths).

    ``u_starts`` (per-item uniform [0,1) draws) selects the training
    ``pad_random`` crop; ``None`` selects the deterministic eval ``pad``
    (head-crop / tile) — semantics of :mod:`rade_tpu.data.padding`.

    ``lengths[i]`` is the decoded sample count, or a negative error code
    with a zero-filled row.  By default any failure raises (the training
    pipeline must never silently train on zero waveforms — the reference
    raises on unreadable files too); pass ``lenient=True`` on eval paths
    that intentionally keep zero rows (the 2021-eval zero-pad fallback,
    ``/root/reference/src/data_utils.py:221-228``).
    """
    lib = _load()
    n = len(paths)
    out = np.empty((n, int(T)), dtype=np.float32)
    lengths = np.empty((n,), dtype=np.int64)
    if n == 0:
        return out, lengths
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(str(p)) for p in paths]
    )
    if u_starts is not None:
        u = np.ascontiguousarray(u_starts, dtype=np.float64)
        if u.shape != (n,):
            raise ValueError(
                f"u_starts must have shape ({n},), got {u.shape}"
            )
        u_ptr = u.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    else:
        u_ptr = None
    failed = lib.rade_batch_load(
        c_paths, n, u_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(T),
        int(threads if threads is not None else default_threads()),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if failed and not lenient:
        bad = [
            (str(paths[i]), int(lengths[i]))
            for i in range(n)
            if lengths[i] <= 0
        ]
        raise RuntimeError(
            f"native batch_load failed on {failed}/{n} files "
            f"(first few: {bad[:4]}); pass lenient=True to keep "
            "zero-filled rows"
        )
    return out, lengths
