"""RawBoost (simplified + official) and codec-sim augmentation tests."""

import numpy as np
import pytest

from rade_tpu.augment.codec import apply_codec_sim
from rade_tpu.augment.rawboost import RawBoost, RawBoostOfficial


@pytest.fixture()
def wave():
    rng = np.random.RandomState(42)
    t = np.arange(16000) / 16000.0
    return 0.4 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.randn(16000)


def test_lnl_preserves_rms(wave):
    rb = RawBoost(rng=np.random.RandomState(0))
    y = rb.lnl_convolutive_noise(wave)
    assert y.shape == wave.shape
    rms_in = np.sqrt(np.mean(wave**2))
    rms_out = np.sqrt(np.mean(y**2))
    assert rms_out == pytest.approx(rms_in, rel=1e-9)
    assert not np.allclose(y, wave)


def test_isd_only_scales_masked_samples(wave):
    rb = RawBoost(rng=np.random.RandomState(1))
    y = rb.isd_additive_noise(wave)
    changed = y != wave
    # Bernoulli mask with p in [1/9, 1/5]: a minority of samples change
    frac = changed.mean()
    assert 0.02 < frac < 0.5
    # unchanged samples are bit-identical (additive term is x-proportional)
    assert np.array_equal(y[~changed], wave[~changed])


def test_stationary_noise_hits_target_snr_range(wave):
    rb = RawBoost(rng=np.random.RandomState(2))
    y = rb.stationary_noise(wave)
    noise = y - wave
    snr_db = 10 * np.log10(np.sum(wave**2) / np.sum(noise**2))
    assert 9.0 < snr_db < 41.0


def test_algo5_random_choice(wave):
    rb = RawBoost.from_algo(5, rng=np.random.RandomState(3))
    assert rb.algo_id == [1, 2, 3, 4]
    ys = [rb.process(wave) for _ in range(8)]
    assert all(y.shape == wave.shape for y in ys)
    assert any(not np.allclose(y, wave) for y in ys)


def test_algo0_identity(wave):
    rb = RawBoost.from_algo(0, rng=np.random.RandomState(4))
    assert np.array_equal(rb.process(wave), wave)


def test_official_lnl(wave):
    rb = RawBoostOfficial(rng=np.random.RandomState(5))
    y = rb.lnl_convolutive_noise(wave)
    assert y.shape == wave.shape
    assert abs(np.mean(y)) < 1e-10  # mean-removed
    assert np.max(np.abs(y)) <= 1.0 + 1e-12


def test_official_isd(wave):
    # low amplitude so the post-hoc peak renormalization can't trigger
    x = 0.2 * wave
    rb = RawBoostOfficial(rng=np.random.RandomState(6))
    y = rb.process(x, algo=2)
    assert y.shape == x.shape
    changed = (y != x).mean()
    assert changed <= 0.11  # beta is at most P=10 percent of samples


def test_official_ssi_snr(wave):
    rb = RawBoostOfficial(rng=np.random.RandomState(7))
    y = rb.ssi_additive_noise(wave)
    noise = y - wave
    snr_db = 20 * np.log10(np.linalg.norm(wave) / np.linalg.norm(noise))
    assert 9.0 < snr_db < 41.0


def test_official_series_combo(wave):
    rb = RawBoostOfficial(rng=np.random.RandomState(8))
    y = rb.process(wave, algo=4)
    assert y.shape == wave.shape and not np.allclose(y, wave)


def test_codec_sim_bandlimits(wave):
    rng = np.random.RandomState(9)
    y = apply_codec_sim(wave, inner_p=1.0, rng=rng)
    assert y.shape == wave.shape
    spec_in = np.abs(np.fft.rfft(wave))
    spec_out = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(wave), 1 / 16000)
    hf = freqs > 5000
    # high-frequency content strongly attenuated after 16k->{8k,6k,4k}->16k
    assert np.sum(spec_out[hf]) < 0.2 * np.sum(spec_in[hf]) + 1e-6


def test_codec_sim_skip(wave):
    y = apply_codec_sim(wave, inner_p=0.0, rng=np.random.RandomState(10))
    assert np.array_equal(y, wave)
