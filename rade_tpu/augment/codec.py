"""Codec-simulation augmentation: bandwidth loss via down/up resampling.

The reference simulates MP3/AAC artifacts by resampling 16k -> {8k, 6k, 4k}
-> 16k (`/root/reference/src/data_utils.py:31-59`, "poor man's codec") with an
inner 50% apply probability.  Host path uses polyphase resampling (same
algorithm family as `torchaudio.transforms.Resample`); the on-device fused
version lives in `rawboost_jax.py` (``codec_sim_batch``, lines ~150-216).

For the COMPRESSED evaluation protocol (the second column of the reference's
headline table, `/root/reference/README.md:92` "4.03 % compressed"), the
codec draw must be a deterministic function of the utterance so every model
is scored against the same compressed rendition of the eval set:
`codec_rng_for_utt` derives a per-utterance RandomState from a stable hash
of (utt_id, seed).
"""

from __future__ import annotations

import zlib
from math import gcd
from typing import Optional, Sequence

import numpy as np
from scipy.signal import resample_poly

CODEC_TARGET_RATES = (8000, 6000, 4000)


def codec_rng_for_utt(utt_id: str, seed: int = 0) -> np.random.RandomState:
    """Deterministic per-utterance RNG: stable across runs and machines.

    crc32 of the utt_id mixed with the protocol seed — NOT Python's
    ``hash()``, which is salted per process.
    """
    h = zlib.crc32(f"{seed}:{utt_id}".encode()) & 0x7FFFFFFF
    return np.random.RandomState(h)


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
