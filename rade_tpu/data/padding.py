"""Fixed-length crop/tile padding (reference `src/data_utils.py:107-127`)."""

from __future__ import annotations

import numpy as np

MAX_LEN = 64600  # ~4.04 s @ 16 kHz — the static sequence length everywhere


def pad(x: np.ndarray, max_len: int = MAX_LEN) -> np.ndarray:
    """Deterministic eval padding: head-crop if long, tile-repeat if short."""
    n = x.shape[0]
    if n >= max_len:
        return x[:max_len]
    reps = max_len // n + 1
    return np.tile(x, reps)[:max_len]


def pad_random(
    x: np.ndarray, max_len: int = MAX_LEN, rng: np.random.RandomState | None = None
) -> np.ndarray:
    """Training padding: random crop if long, tile-repeat if short."""
    rng = rng or np.random
    n = x.shape[0]
    if n > max_len:
        start = rng.randint(n - max_len)
        return x[start : start + max_len]
    if n == max_len:
        return x
    reps = max_len // n + 1
    return np.tile(x, reps)[:max_len]
