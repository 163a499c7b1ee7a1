"""Codec-simulation augmentation: bandwidth loss via down/up resampling.

The reference simulates MP3/AAC artifacts by resampling 16k -> {8k, 6k, 4k}
-> 16k (`/root/reference/src/data_utils.py:31-59`, "poor man's codec") with an
inner 50% apply probability.  Host path uses polyphase resampling (same
algorithm family as `torchaudio.transforms.Resample`); an on-device fused
version lives in `codec_jax.py`.
"""

from __future__ import annotations

from math import gcd
from typing import Optional, Sequence

import numpy as np
from scipy.signal import resample_poly

CODEC_TARGET_RATES = (8000, 6000, 4000)


def apply_codec_sim(
    x: np.ndarray,
    sample_rate: int = 16000,
    target_rates: Sequence[int] = CODEC_TARGET_RATES,
    inner_p: float = 0.5,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """With probability `inner_p`, band-limit x by resampling down then up.

    Output length equals input length (polyphase ratios are exact for the
    16k <-> {8k, 6k, 4k} pairs).
    """
    rng = rng or np.random.RandomState()
    if rng.rand() >= inner_p:
        return x
    target_sr = target_rates[rng.randint(0, len(target_rates))]
    g = gcd(sample_rate, target_sr)
    down = resample_poly(x, target_sr // g, sample_rate // g)
    up = resample_poly(down, sample_rate // g, target_sr // g)
    # guard tiny length drift from odd ratios
    if up.shape[0] < x.shape[0]:
        up = np.pad(up, (0, x.shape[0] - up.shape[0]))
    return up[: x.shape[0]]
