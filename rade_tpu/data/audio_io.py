"""Audio file reading: FLAC (native C++ decoder), WAV (stdlib), NPY.

The reference reads `.flac` via `soundfile` (libsndfile); this image ships no
FLAC library at all, so `rade_tpu/native/flacdec.cpp` implements a FLAC
decoder from scratch, loaded here through ctypes.  WAV (PCM16/PCM32/float32)
and `.npy` are handled in pure Python for synthetic datasets and tests.

`read_audio(path)` returns float64 in [-1, 1) like `soundfile.read` does, so
downstream augmentation numerics match the reference.
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Tuple, Union

import numpy as np

PathLike = Union[str, Path]


def read_wav(path: PathLike) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float64 mono waveform in [-1, 1), sample_rate)."""
    with wave.open(str(path), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif sampwidth == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    return x, sr


def write_wav(path: PathLike, x: np.ndarray, sr: int = 16000) -> None:
    """Write mono float waveform in [-1, 1] as PCM16 WAV."""
    xi = np.clip(np.asarray(x, dtype=np.float64), -1.0, 1.0)
    pcm = (xi * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


_flac_backend = None


def _get_flac_backend():
    global _flac_backend
    if _flac_backend is None:
        from rade_tpu.native import flac as _flac

        _flac_backend = _flac
    return _flac_backend


def read_flac(path: PathLike) -> Tuple[np.ndarray, int]:
    """Read a FLAC file via the native C++ decoder -> (float64 mono, sr)."""
    return _get_flac_backend().decode_file(str(path))


def read_audio(path: PathLike) -> Tuple[np.ndarray, int]:
    """Read audio by extension; returns (float64 mono waveform, sample_rate)."""
    p = Path(path)
    suffix = p.suffix.lower()
    if suffix == ".flac":
        return read_flac(p)
    if suffix == ".wav":
        return read_wav(p)
    if suffix == ".npy":
        x = np.load(p).astype(np.float64)
        return x, 16000
    raise ValueError(f"unsupported audio format: {p}")


def read_utterance(
    base_dir: PathLike, key: str, subdir: str = "flac"
) -> Tuple[np.ndarray, int]:
    """Read ``base_dir/<subdir>/<key>.{flac,wav,npy}``, first hit wins.

    The reference hardcodes ``flac/{key}.flac``
    (`/root/reference/src/data_utils.py:165`); the extension fallback lets
    synthetic WAV/NPY datasets use the same layout.
    """
    base = Path(base_dir) / subdir
    for ext in (".flac", ".wav", ".npy"):
        p = base / f"{key}{ext}"
        if p.exists():
            return read_audio(p)
    raise FileNotFoundError(f"no audio found for key {key!r} under {base}")


def resample_poly(
    x: np.ndarray, orig_sr: int, target_sr: int
) -> np.ndarray:
    """Polyphase resample (host path; scipy)."""
    from scipy.signal import resample_poly as _rp
    from math import gcd

    g = gcd(orig_sr, target_sr)
    return _rp(x, target_sr // g, orig_sr // g)
