"""On-device (jnp) augmentation vs host (scipy/numpy) reference numerics."""

import numpy as np
import pytest
from scipy import signal as sps
from scipy.signal import resample_poly

import jax
import jax.numpy as jnp

from rade_tpu.augment import rawboost_jax as rbj
from rade_tpu.config import DataConfig


@pytest.fixture()
def batch():
    rng = np.random.RandomState(0)
    t = np.arange(4000) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 300 * t)[None] * np.ones((3, 1))
    x = x + 0.02 * rng.randn(3, 4000)
    return jnp.asarray(x.astype(np.float32))


def test_causal_conv_matches_lfilter(batch):
    rng = np.random.RandomState(1)
    kernels = rng.randn(3, 6).astype(np.float32)
    ours = np.asarray(rbj._causal_depthwise_conv(batch, jnp.asarray(kernels)))
    for i in range(3):
        ref = sps.lfilter(kernels[i], [1.0], np.asarray(batch)[i])
        np.testing.assert_allclose(ours[i], ref, rtol=1e-4, atol=1e-5)


def test_ar_inverse_taps_invert_the_filter():
    # h_inv * a should be ~ a unit impulse
    key = jax.random.PRNGKey(0)
    taps = np.asarray(rbj._ar_inverse_taps(key, 4))
    assert taps.shape == (4, rbj.AR_INV_TAPS)
    np.testing.assert_allclose(taps[:, 0], 1.0)
    # |h| decays fast for coefficients in [-0.1, 0.1]
    assert np.all(np.abs(taps[:, -1]) < 1e-6)


def test_lnl_preserves_rms_and_changes_signal(batch):
    y = np.asarray(rbj.lnl_convolutive_noise(jax.random.PRNGKey(1), batch))
    x = np.asarray(batch)
    rms_in = np.sqrt((x**2).mean(axis=1))
    rms_out = np.sqrt((y**2).mean(axis=1))
    np.testing.assert_allclose(rms_out, rms_in, rtol=1e-4)
    assert not np.allclose(y, x)


def test_isd_masks_minority(batch):
    y = np.asarray(rbj.isd_additive_noise(jax.random.PRNGKey(2), batch))
    changed = (y != np.asarray(batch)).mean()
    assert 0.02 < changed < 0.5


def test_stationary_snr(batch):
    y = np.asarray(rbj.stationary_noise(jax.random.PRNGKey(3), batch))
    x = np.asarray(batch)
    noise = y - x
    snr = 10 * np.log10((x**2).sum(axis=1) / (noise**2).sum(axis=1))
    assert np.all(snr > 9) and np.all(snr < 41)


def test_rawboost_batch_probability(batch):
    y0 = np.asarray(rbj.rawboost_batch(jax.random.PRNGKey(4), batch, p=0.0))
    np.testing.assert_array_equal(y0, np.asarray(batch))
    y1 = np.asarray(rbj.rawboost_batch(jax.random.PRNGKey(4), batch, p=1.0))
    assert not np.allclose(y1, np.asarray(batch))


def test_resample_matches_scipy(batch):
    x = np.asarray(batch)
    for up, down in [(1, 2), (3, 8), (1, 4), (2, 3), (8, 3)]:
        ours = np.asarray(rbj._resample_poly_jnp(batch, up, down))
        ref = resample_poly(x, up, down, axis=1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_codec_sim_bandlimits(batch):
    y = np.asarray(rbj.codec_sim_batch(jax.random.PRNGKey(5), batch, p=1.0))
    assert y.shape == batch.shape
    x = np.asarray(batch)
    spec_in = np.abs(np.fft.rfft(x, axis=1))
    spec_out = np.abs(np.fft.rfft(y, axis=1))
    freqs = np.fft.rfftfreq(x.shape[1], 1 / 16000)
    hf = freqs > 5000
    assert spec_out[:, hf].sum() < 0.5 * spec_in[:, hf].sum() + 1e-6


def test_augment_batch_jits(batch):
    cfg = DataConfig(use_rawboost=True, rawboost_algo=5, rawboost_p=0.8,
                     use_codec_aug=True, codec_p=0.3)
    fn = jax.jit(lambda k, x: rbj.augment_batch(k, x, cfg))
    y = np.asarray(fn(jax.random.PRNGKey(6), batch))
    assert y.shape == batch.shape and np.all(np.isfinite(y))
