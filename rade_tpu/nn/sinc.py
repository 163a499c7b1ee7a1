"""Mel-spaced sinc bandpass filterbank frontend ("SincConv").

TPU-native equivalent of the reference `CONV` frontend
(`/root/reference/models/AASIST.py:325-410`): a fixed (non-learnable) bank of
`out_channels` Hamming-windowed ideal bandpass filters with mel-spaced band
edges, applied as a 1-D convolution, with optional random filter-band masking
as frequency augmentation.  The bank is precomputed once in numpy; the conv
runs as one `lax.conv_general_dilated` (XLA maps it onto the MXU).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def mel_spaced_band_edges(out_channels: int, sample_rate: int, nfft: int = 512) -> np.ndarray:
    """Band edges (Hz): mel-uniform split of [0, sr/2] into `out_channels` bands."""
    f = (sample_rate / 2) * np.linspace(0, 1, nfft // 2 + 1)
    mel = 2595 * np.log10(1 + f / 700)
    mel_edges = np.linspace(mel.min(), mel.max(), out_channels + 1)
    return 700 * (10 ** (mel_edges / 2595) - 1)


def sinc_bandpass_bank(
    out_channels: int, kernel_size: int, sample_rate: int = 16000
) -> np.ndarray:
    """(out_channels, kernel_size) Hamming-windowed ideal bandpass bank.

    Kernel size is forced odd (symmetric filters), as in the reference.
    """
    if kernel_size % 2 == 0:
        kernel_size += 1
    edges = mel_spaced_band_edges(out_channels, sample_rate)
    support = np.arange(-(kernel_size - 1) / 2, (kernel_size - 1) / 2 + 1)
    window = np.hamming(kernel_size)
    bank = np.zeros((out_channels, kernel_size))
    for i in range(out_channels):
        f_lo, f_hi = edges[i], edges[i + 1]
        h_hi = (2 * f_hi / sample_rate) * np.sinc(2 * f_hi * support / sample_rate)
        h_lo = (2 * f_lo / sample_rate) * np.sinc(2 * f_lo * support / sample_rate)
        bank[i] = window * (h_hi - h_lo)
    return bank


class SincConv(nn.Module):
    """Fixed sinc filterbank conv1d with optional random band-mask freq-aug.

    Input ``(B, T)`` -> output ``(B, out_channels, T - K + 1)``.
    """

    out_channels: int = 70
    kernel_size: int = 128
    sample_rate: int = 16000
    mask_max_bands: int = 20  # freq-aug masks A ~ U{0..19} consecutive filters

    def setup(self):
        bank = sinc_bandpass_bank(self.out_channels, self.kernel_size, self.sample_rate)
        self.bank = jnp.asarray(bank, dtype=jnp.float32)

    def __call__(self, x: jax.Array, freq_aug: bool = False) -> jax.Array:
        # the bank is a module constant, not a param: follow the input's
        # compute dtype (bf16 mixed precision would otherwise be promoted
        # back to f32 here and poison the whole downstream stream)
        filters = self.bank.astype(x.dtype)
        if freq_aug:
            rng = self.make_rng("freq_aug")
            k_a, k_s = jax.random.split(rng)
            n_masked = jnp.floor(
                jax.random.uniform(k_a, (), minval=0.0, maxval=float(self.mask_max_bands))
            ).astype(jnp.int32)
            start = jnp.floor(
                jax.random.uniform(k_s, ())
                * (self.out_channels - n_masked + 1).astype(jnp.float32)
            ).astype(jnp.int32)
            band = jnp.arange(self.out_channels)
            keep = (band < start) | (band >= start + n_masked)
            filters = filters * keep[:, None].astype(filters.dtype)

        # (B, T) -> (B, 1, T); kernel (O, I, K); conv1d valid padding
        y = jax.lax.conv_general_dilated(
            x[:, None, :],
            filters[:, None, :],
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return y
