"""On-device batched RawBoost + codec-sim augmentation (pure jnp, PRNG-keyed).

The reference runs RawBoost per-sample in DataLoader workers with scipy
(`/root/reference/src/rawboost.py`, `src/data_utils.py:163-181`) — a host
bottleneck.  Here the whole augmentation chain is jnp over the batch, fused by
XLA into the train step, so augmented batches are produced on-device:

- LnL convolutive noise: the random first-order FIR cascade is built as a
  degree-5 polynomial per sample; the small random AR filter's ``1/a(z)`` is
  expanded to a truncated causal impulse response (the reference's AR
  coefficients are in [-0.1, 0.1], so the response decays below fp32 epsilon
  within ~32 taps) — the whole filter becomes two causal depthwise convs;
- ISD / stationary noise: direct jnp;
- algo-5 mixing: all four variants are computed and one-hot selected per
  sample (augmentation is tiny next to the model, so 4x its cost is noise);
- codec-sim: polyphase 16k -> {8k, 6k, 4k} -> 16k with scipy-designed
  (static) Kaiser low-pass kernels applied as strided/transposed convs.

Numerics match the host implementations to float tolerance (tested).
"""

from __future__ import annotations

import functools
from math import gcd
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

AR_INV_TAPS = 32


def _causal_depthwise_conv(x: jax.Array, kernels: jax.Array) -> jax.Array:
    """Per-sample causal FIR: x (B, T), kernels (B, K) -> (B, T).

    y[t] = sum_k kernel[k] * x[t-k] (scipy lfilter(b, 1, x) semantics).
    """
    bsz, t = x.shape
    k = kernels.shape[1]
    x_pad = jnp.pad(x, ((0, 0), (k - 1, 0)))
    # batch-as-channels grouped conv: (1, B, T+K-1) * (B, 1, K)
    y = jax.lax.conv_general_dilated(
        x_pad[None],
        jnp.flip(kernels, axis=1)[:, None, :],
        window_strides=(1,),
        padding="VALID",
        feature_group_count=bsz,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y[0]


def _fir_cascade(key: jax.Array, bsz: int, n_sections: int = 5) -> jax.Array:
    """Random cascade of first-order FIR sections -> (B, n_sections+1) poly."""
    coeffs = jax.random.uniform(key, (bsz, n_sections), minval=-1.0, maxval=1.0)
    b = jnp.zeros((bsz, n_sections + 1)).at[:, 0].set(1.0)

    for i in range(n_sections):
        # multiply polynomial by (1 + c_i z^-1)
        shifted = jnp.pad(b, ((0, 0), (1, 0)))[:, : n_sections + 1]
        b = b + coeffs[:, i : i + 1] * shifted
    return b


def _ar_inverse_taps(key: jax.Array, bsz: int, max_order: int = 5) -> jax.Array:
    """Random AR poly (random order 1..5, coeffs U[-0.1, 0.1]) -> 1/a(z) taps.

    a(z) = prod of (1 + c_j z^-1) with inactive sections zeroed; the inverse
    impulse response follows h[0]=1, h[t] = -sum_j a_j h[t-j].
    """
    k_order, k_coeff = jax.random.split(key)
    order = jax.random.randint(k_order, (bsz,), 1, max_order + 1)
    coeffs = jax.random.uniform(
        k_coeff, (bsz, max_order), minval=-0.1, maxval=0.1
    )
    active = (jnp.arange(max_order)[None] < order[:, None]).astype(coeffs.dtype)
    coeffs = coeffs * active
    # expand product poly a(z): degree max_order
    a = jnp.zeros((bsz, max_order + 1)).at[:, 0].set(1.0)
    for i in range(max_order):
        shifted = jnp.pad(a, ((0, 0), (1, 0)))[:, : max_order + 1]
        a = a + coeffs[:, i : i + 1] * shifted

    def step(h_hist, _):
        # h_hist: (B, max_order) most-recent-first
        h_new = -jnp.sum(a[:, 1:] * h_hist, axis=1)
        h_hist = jnp.concatenate([h_new[:, None], h_hist[:, :-1]], axis=1)
        return h_hist, h_new

    h0 = jnp.zeros((bsz, max_order)).at[:, 0].set(1.0)
    _, tail = jax.lax.scan(step, h0, None, length=AR_INV_TAPS - 1)
    return jnp.concatenate([jnp.ones((bsz, 1)), tail.T], axis=1)  # (B, taps)


def lnl_convolutive_noise(key: jax.Array, x: jax.Array) -> jax.Array:
    """Batched LnL: FIR cascade ∘ AR-inverse ∘ quadratic distortion ∘ RMS renorm."""
    k_fir, k_ar, k_f = jax.random.split(key, 3)
    bsz = x.shape[0]
    b = _fir_cascade(k_fir, bsz)
    h_inv = _ar_inverse_taps(k_ar, bsz)
    y = _causal_depthwise_conv(x, b)
    y = _causal_depthwise_conv(y, h_inv)
    f = jax.random.normal(k_f, (bsz, 1))
    y = y + f * jnp.square(y)
    rms_in = jnp.sqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True))
    rms_out = jnp.sqrt(jnp.mean(jnp.square(y), axis=1, keepdims=True))
    return jnp.where(rms_out > 0, y * rms_in / (rms_out + 1e-12), x)


def isd_additive_noise(key: jax.Array, x: jax.Array, p_max: int = 10, g_sd: float = 2.0):
    k_beta, k_noise, k_mask = jax.random.split(key, 3)
    bsz, t = x.shape
    beta = jax.random.randint(k_beta, (bsz, 1), 5, p_max).astype(x.dtype)
    noise = jax.random.normal(k_noise, (bsz, t), x.dtype)
    mask = (jax.random.uniform(k_mask, (bsz, t)) < 1.0 / beta).astype(x.dtype)
    return x + g_sd * noise * mask * x


def stationary_noise(key: jax.Array, x: jax.Array, snr_min=10.0, snr_max=40.0):
    k_noise, k_snr = jax.random.split(key)
    bsz, t = x.shape
    noise = jax.random.normal(k_noise, (bsz, t), x.dtype)
    snr_db = jax.random.uniform(k_snr, (bsz, 1), minval=snr_min, maxval=snr_max)
    sig_p = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    noise_p = jnp.sum(jnp.square(noise), axis=1, keepdims=True)
    scale = jnp.sqrt(sig_p / (10 ** (snr_db / 10)) / (noise_p + 1e-9))
    return x + noise * scale


def rawboost_batch(key: jax.Array, x: jax.Array, p: float = 1.0) -> jax.Array:
    """Algo-5 RawBoost: per-sample uniform choice of {LnL, ISD, SSI, LnL∘ISD},
    each applied with probability `p` (reference `data_utils.py:150-174`)."""
    k_alg, k_apply, k1, k2, k3, k4 = jax.random.split(key, 6)
    bsz = x.shape[0]
    lnl = lnl_convolutive_noise(k1, x)
    isd = isd_additive_noise(k2, x)
    ssi = stationary_noise(k3, x)
    combo = isd_additive_noise(k4, lnl)
    choice = jax.random.randint(k_alg, (bsz,), 0, 4)
    stacked = jnp.stack([lnl, isd, ssi, combo], axis=0)  # (4, B, T)
    onehot = jax.nn.one_hot(choice, 4, dtype=x.dtype).T[:, :, None]
    aug = jnp.sum(stacked * onehot, axis=0)
    apply_mask = (jax.random.uniform(k_apply, (bsz, 1)) < p).astype(x.dtype)
    return aug * apply_mask + x * (1.0 - apply_mask)


# ---------------------------------------------------------------------------
# codec simulation: polyphase resample with static scipy-designed kernels
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _resample_kernel(up: int, down: int) -> np.ndarray:
    """The scipy.signal.resample_poly default Kaiser filter (static)."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float32)


def _resample_poly_jnp(x: jax.Array, up: int, down: int) -> jax.Array:
    """scipy resample_poly semantics: zero-stuff by `up`, filter, take every `down`."""
    h = jnp.asarray(_resample_kernel(up, down))
    n_in = x.shape[1]
    n_out = -(-n_in * up // down)
    half = (h.shape[0] - 1) // 2
    # upsample via transposed conv (zero stuffing + filtering in one op)
    y = jax.lax.conv_transpose(
        x[:, None, :], h[None, None, :], strides=(up,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    # scipy aligns the filter center with sample 0
    y = y[:, half : half + n_in * up]
    return y[:, ::down][:, :n_out]


def codec_sim_batch(
    key: jax.Array, x: jax.Array, p: float = 0.5,
    sample_rate: int = 16000, target_rates: Tuple[int, ...] = (8000, 6000, 4000),
) -> jax.Array:
    """Bandwidth-loss codec sim: down/up resample, per-sample random rate.

    Matches the reference's `apply_codec_aug` (`data_utils.py:31-59`): inner
    probability `p`, random target rate per sample; output length == input.
    """
    k_apply, k_rate = jax.random.split(key)
    bsz, t = x.shape
    variants = []
    for tgt in target_rates:
        g = gcd(sample_rate, tgt)
        up1, down1 = tgt // g, sample_rate // g
        down = _resample_poly_jnp(x, up1, down1)
        back = _resample_poly_jnp(down, down1, up1)
        if back.shape[1] < t:
            back = jnp.pad(back, ((0, 0), (0, t - back.shape[1])))
        variants.append(back[:, :t])
    stacked = jnp.stack(variants, axis=0)  # (R, B, T)
    choice = jax.random.randint(k_rate, (bsz,), 0, len(target_rates))
    onehot = jax.nn.one_hot(choice, len(target_rates), dtype=x.dtype).T[:, :, None]
    coded = jnp.sum(stacked * onehot, axis=0)
    apply_mask = (jax.random.uniform(k_apply, (bsz, 1)) < p).astype(x.dtype)
    return coded * apply_mask + x * (1.0 - apply_mask)


def augment_batch(key: jax.Array, x: jax.Array, data_cfg) -> jax.Array:
    """The full Phase-6 on-device chain: RawBoost(algo 5, p) then codec-sim."""
    k_rb, k_codec = jax.random.split(key)
    if data_cfg.use_rawboost and data_cfg.rawboost_algo != 0:
        x = rawboost_batch(k_rb, x, p=data_cfg.rawboost_p)
    if data_cfg.use_codec_aug:
        # reference: outer prob codec_p, inner prob 0.5 (`data_utils.py:35`)
        x = codec_sim_batch(k_codec, x, p=data_cfg.codec_p * 0.5)
    return x
