"""RawBoost waveform augmentation (LnL / ISD / SSI), host (numpy) path.

Two variants, mirroring the reference:

- :class:`RawBoost` — the *simplified* variant the reference actually trains
  with (`/root/reference/src/rawboost.py`): algo 1 = random FIR cascade +
  small AR filter + quadratic nonlinearity with RMS re-normalization, algo 2 =
  Bernoulli-masked signal-dependent impulsive noise, algo 3 = white noise at a
  uniform random SNR, algo 4 = 1∘2.  Phase 6 uses ``algo 5`` = uniform choice
  over {1, 2, 3, 4} per call (`src/data_utils.py:150-158`).
- :class:`RawBoostOfficial` — the faithful ICASSP'22 RawBoost
  (`/root/reference/src/rawboost_official.py`): multi-band FIR notch filters
  designed with `firwin`, per-power convolutive mixing, percentage-based
  impulsive noise, SNR-scaled filtered stationary noise.

A batched on-device jnp version lives in `rawboost_jax.py`; this module is the
bit-exact host reference used by its tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy import signal as sps


class RawBoost:
    """Simplified RawBoost (the Phase-6 training augmentation)."""

    def __init__(
        self,
        algo_id: Sequence[int] = (0, 1, 2, 3, 4),
        fs: int = 16000,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.algo_id = list(algo_id)
        self.fs = fs
        self.rng = rng if rng is not None else np.random.RandomState()

    @classmethod
    def from_algo(cls, algo: int, fs: int = 16000, rng=None) -> "RawBoost":
        """Config codes: 0=None, 1=LnL, 2=ISD, 3=SSI, 4=LnL+ISD, 5=random{1..4}."""
        if algo == 5:
            return cls(algo_id=[1, 2, 3, 4], fs=fs, rng=rng)
        return cls(algo_id=[algo], fs=fs, rng=rng)

    def process(self, x: np.ndarray) -> np.ndarray:
        algo = self.algo_id[self.rng.randint(0, len(self.algo_id))]
        if algo == 1:
            return self.lnl_convolutive_noise(x)
        if algo == 2:
            return self.isd_additive_noise(x)
        if algo == 3:
            return self.stationary_noise(x)
        if algo == 4:
            return self.isd_additive_noise(self.lnl_convolutive_noise(x))
        return x

    def lnl_convolutive_noise(
        self,
        x: np.ndarray,
        n_fir_sections: int = 5,
        ar_orders: Sequence[int] = (1, 2, 3, 4, 5),
    ) -> np.ndarray:
        """Random FIR cascade + small random AR filter + quadratic distortion."""
        x = np.ravel(x)
        rng = self.rng
        ar_order = ar_orders[rng.randint(0, len(ar_orders))]
        rng.randint(10, 100)  # gain slot drawn (and unused) exactly like the reference

        b = np.array([1.0])
        for _ in range(n_fir_sections):
            b = np.convolve(b, np.array([1.0, rng.uniform(-1, 1)]))
        a = np.array([1.0])
        for _ in range(ar_order):
            a = np.convolve(a, np.array([1.0, rng.uniform(-0.1, 0.1)]))

        y = sps.lfilter(b, a, x)
        y = y + rng.randn() * np.square(y)

        rms_in = np.sqrt(np.mean(x**2))
        rms_out = np.sqrt(np.mean(y**2))
        if rms_out == 0:
            return x
        return y * (rms_in / rms_out)

    def isd_additive_noise(
        self, x: np.ndarray, p_max: int = 10, g_sd: float = 2.0
    ) -> np.ndarray:
        """Bernoulli-masked signal-dependent impulsive noise."""
        x = np.ravel(x)
        rng = self.rng
        beta = range(5, p_max)[rng.randint(0, p_max - 5)]
        noise = rng.randn(x.shape[0])
        mask = rng.choice([0, 1], size=x.shape[0], p=[1 - 1 / beta, 1 / beta])
        return x + g_sd * (noise * mask) * x

    def stationary_noise(
        self, x: np.ndarray, snr_min: float = 10.0, snr_max: float = 40.0
    ) -> np.ndarray:
        """White noise at a uniform random SNR in [snr_min, snr_max] dB."""
        x = np.ravel(x)
        rng = self.rng
        noise = rng.randn(x.shape[0])
        snr_db = rng.uniform(snr_min, snr_max)
        sig_power = np.sum(x**2)
        noise_power = np.sum(noise**2)
        scale = np.sqrt(sig_power / (10 ** (snr_db / 10)) / (noise_power + 1e-9))
        return x + noise * scale


# ----------------------------------------------------------------------------
# Official ICASSP'22 RawBoost
# ----------------------------------------------------------------------------


def _norm_wav(x: np.ndarray, always: bool) -> np.ndarray:
    peak = np.amax(np.abs(x))
    if always or peak > 1:
        return x / peak
    return x


class RawBoostOfficial:
    """Faithful RawBoost (Tak et al., ICASSP 2022) with the official defaults."""

    def __init__(
        self,
        fs: int = 16000,
        n_bands: int = 5,
        min_f: float = 20,
        max_f: float = 8000,
        min_bw: float = 100,
        max_bw: float = 1000,
        min_coeff: int = 10,
        max_coeff: int = 100,
        min_g: float = 0,
        max_g: float = 0,
        min_bias_lin_nonlin: float = 5,
        max_bias_lin_nonlin: float = 20,
        n_f: int = 5,
        p: float = 10,
        g_sd: float = 2,
        snr_min: float = 10,
        snr_max: float = 40,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.fs = fs
        self.n_bands = n_bands
        self.min_f, self.max_f = min_f, max_f
        self.min_bw, self.max_bw = min_bw, max_bw
        self.min_coeff, self.max_coeff = min_coeff, max_coeff
        self.min_g, self.max_g = min_g, max_g
        self.min_bias, self.max_bias = min_bias_lin_nonlin, max_bias_lin_nonlin
        self.n_f = n_f
        self.p = p
        self.g_sd = g_sd
        self.snr_min, self.snr_max = snr_min, snr_max
        self.rng = rng if rng is not None else np.random.RandomState()

    def _rand(self, lo, hi, integer=False):
        v = self.rng.uniform(lo, hi)
        return int(v) if integer else v

    def gen_notch_coeffs(self, min_g=None, max_g=None) -> np.ndarray:
        """Random multi-band FIR filter: cascade of `firwin` bandpass sections."""
        min_g = self.min_g if min_g is None else min_g
        max_g = self.max_g if max_g is None else max_g
        b = np.array([1.0])
        for _ in range(self.n_bands):
            fc = self._rand(self.min_f, self.max_f)
            bw = self._rand(self.min_bw, self.max_bw)
            c = self._rand(self.min_coeff, self.max_coeff, integer=True)
            if c % 2 == 0:
                c += 1
            f1 = max(fc - bw / 2, 1 / 1000)
            f2 = min(fc + bw / 2, self.fs / 2 - 1 / 1000)
            b = np.convolve(
                sps.firwin(c, [float(f1), float(f2)], window="hamming", fs=self.fs), b
            )
        gain_db = self._rand(min_g, max_g)
        _, h = sps.freqz(b, 1, fs=self.fs)
        return (10 ** (gain_db / 20)) * b / np.amax(np.abs(h))

    @staticmethod
    def filter_fir(x: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Zero-phase-ish FIR: pad, filter, trim half the kernel both sides."""
        n = b.shape[0] + 1
        y = sps.lfilter(b, 1, np.pad(x, (0, n)))
        return y[n // 2 : y.shape[0] - n // 2]

    def lnl_convolutive_noise(self, x: np.ndarray) -> np.ndarray:
        """Sum of per-power filtered signal terms (linear + nonlinear branches)."""
        y = np.zeros_like(x, dtype=np.float64)
        min_g, max_g = self.min_g, self.max_g
        for i in range(self.n_f):
            if i == 1:
                min_g = self.min_g - self.min_bias
                max_g = self.max_g - self.max_bias
            b = self.gen_notch_coeffs(min_g, max_g)
            y = y + self.filter_fir(np.power(x, i + 1), b)
        y = y - np.mean(y)
        return _norm_wav(y, always=False)

    def isd_additive_noise(self, x: np.ndarray) -> np.ndarray:
        """Impulsive noise on a random beta% subset of samples."""
        beta = self._rand(0, self.p)
        y = np.array(x, copy=True)
        n = int(x.shape[0] * (beta / 100))
        pos = self.rng.permutation(x.shape[0])[:n]
        f_r = (2 * self.rng.rand(n) - 1) * (2 * self.rng.rand(n) - 1)
        y[pos] = x[pos] + self.g_sd * x[pos] * f_r
        return _norm_wav(y, always=False)

    def ssi_additive_noise(self, x: np.ndarray) -> np.ndarray:
        """Stationary colored noise at a random SNR."""
        noise = self.rng.normal(0, 1, x.shape[0])
        b = self.gen_notch_coeffs()
        noise = _norm_wav(self.filter_fir(noise, b), always=True)
        snr = self._rand(self.snr_min, self.snr_max)
        noise = (
            noise
            / np.linalg.norm(noise, 2)
            * np.linalg.norm(x, 2)
            / 10.0 ** (0.05 * snr)
        )
        return x + noise

    def process(self, x: np.ndarray, algo: int) -> np.ndarray:
        x = np.ravel(np.asarray(x, dtype=np.float64))
        if algo == 1:
            return self.lnl_convolutive_noise(x)
        if algo == 2:
            return self.isd_additive_noise(x)
        if algo == 3:
            return self.ssi_additive_noise(x)
        if algo == 4:
            return self.isd_additive_noise(self.lnl_convolutive_noise(x))
        if algo == 5:
            return self.process(x, int(self.rng.choice([1, 2, 3, 4])))
        return x
