"""Golden tests for EER / t-DCF against the official implementation.

Expected values were computed once with the official ASVspoof metric package
(`tDCF_python_v2/eval_metrics.py`) on the synthetic score distributions below
(seed 1234); our implementation must reproduce them to float tolerance.
"""

import numpy as np
import pytest

from rade_tpu.evaluate import metrics


def _synthetic_scores():
    rng = np.random.RandomState(1234)
    bona = rng.normal(2.0, 1.0, 700)
    spoof = rng.normal(-1.0, 1.5, 2000)
    tar = rng.normal(3.0, 1.0, 500)
    non = rng.normal(-2.0, 1.2, 500)
    spf = rng.normal(0.5, 1.5, 800)
    return bona, spoof, tar, non, spf


# Oracle values from the official package on the seed-1234 distributions.
GOLDEN_EER_CM = 0.11560714285714285
GOLDEN_THR_CM = 0.8473408907490476
GOLDEN_EER_ASV = 0.006
GOLDEN_THR_ASV = 0.6456948538851859
GOLDEN_ASV_RATES = (0.008, 0.006, 0.525, 0.475)
GOLDEN_MIN_TDCF_LEGACY = 0.3146353142857143
GOLDEN_MIN_TDCF_REVISED = 0.33262767224206813
GOLDEN_ARGMIN = 1591
GOLDEN_CURVE_LEN = 2701


def test_eer_matches_official():
    bona, spoof, *_ = _synthetic_scores()
    eer, thr = metrics.compute_eer(bona, spoof)
    assert eer == pytest.approx(GOLDEN_EER_CM, abs=1e-15)
    assert thr == pytest.approx(GOLDEN_THR_CM, abs=1e-15)


def test_asv_operating_point_matches_official():
    _, _, tar, non, spf = _synthetic_scores()
    eer_asv, thr_asv = metrics.compute_eer(tar, non)
    assert eer_asv == pytest.approx(GOLDEN_EER_ASV, abs=1e-15)
    assert thr_asv == pytest.approx(GOLDEN_THR_ASV, abs=1e-15)
    rates = metrics.obtain_asv_error_rates(tar, non, spf, thr_asv)
    assert rates == pytest.approx(GOLDEN_ASV_RATES, abs=1e-15)


def test_tdcf_legacy_matches_official():
    bona, spoof, tar, non, spf = _synthetic_scores()
    _, thr_asv = metrics.compute_eer(tar, non)
    pfa, pmiss, pmiss_spoof, _ = metrics.obtain_asv_error_rates(tar, non, spf, thr_asv)
    curve, thresholds = metrics.compute_tdcf_legacy(bona, spoof, pfa, pmiss, pmiss_spoof)
    assert len(curve) == GOLDEN_CURVE_LEN
    assert len(thresholds) == GOLDEN_CURVE_LEN
    assert int(np.argmin(curve)) == GOLDEN_ARGMIN
    assert float(np.min(curve)) == pytest.approx(GOLDEN_MIN_TDCF_LEGACY, abs=1e-15)
    # Curve starts at the all-reject point: Pmiss=0, Pfa=1 -> C2/min(C1,C2)... = 1.0
    assert curve[0] == pytest.approx(1.0)


def test_tdcf_revised_matches_official():
    bona, spoof, tar, non, spf = _synthetic_scores()
    _, thr_asv = metrics.compute_eer(tar, non)
    pfa, pmiss, _, pfa_spoof = metrics.obtain_asv_error_rates(tar, non, spf, thr_asv)
    curve, _ = metrics.compute_tdcf_revised(bona, spoof, pfa, pmiss, pfa_spoof)
    assert float(np.min(curve)) == pytest.approx(GOLDEN_MIN_TDCF_REVISED, abs=1e-15)
    assert int(np.argmin(curve)) == GOLDEN_ARGMIN


def test_det_curve_properties():
    bona, spoof, *_ = _synthetic_scores()
    frr, far, thr = metrics.compute_det_curve(bona, spoof)
    assert frr[0] == 0.0 and far[0] == 1.0
    assert frr[-1] == 1.0 and far[-1] == 0.0
    assert np.all(np.diff(frr) >= 0)
    assert np.all(np.diff(far) <= 0)
    assert np.all(np.diff(thr) >= 0)


def test_eer_minflip_is_sign_invariant():
    bona, spoof, *_ = _synthetic_scores()
    e1 = metrics.compute_eer_minflip(bona, spoof)
    e2 = metrics.compute_eer_minflip(-bona, -spoof)
    assert e1 == pytest.approx(e2)
    assert e1 == pytest.approx(100.0 * GOLDEN_EER_CM, abs=1e-10)


def test_eer_jax_matches_numpy():
    bona, spoof, *_ = _synthetic_scores()
    eer_np, thr_np = metrics.compute_eer(bona, spoof)
    eer_j, thr_j = metrics.compute_eer_jax(bona, spoof)
    assert float(eer_j) == pytest.approx(eer_np, abs=1e-6)
    assert float(thr_j) == pytest.approx(thr_np, abs=1e-5)


def test_eer_jax_with_ties():
    # Quantized scores produce heavy ties; jnp path must match numpy path.
    rng = np.random.RandomState(7)
    bona = np.round(rng.normal(1.0, 1.0, 500), 1)
    spoof = np.round(rng.normal(-1.0, 1.0, 900), 1)
    eer_np, _ = metrics.compute_eer(bona, spoof)
    eer_j, _ = metrics.compute_eer_jax(bona, spoof)
    assert float(eer_j) == pytest.approx(eer_np, abs=1e-6)


def test_tdcf_rejects_degenerate_scores():
    with pytest.raises(ValueError):
        metrics.compute_tdcf_legacy(
            np.array([1.0, 1.0]), np.array([0.0, 0.0]), 0.01, 0.01, 0.5
        )
    with pytest.raises(ValueError):
        metrics.compute_tdcf_legacy(
            np.array([1.0, np.nan, 2.0]), np.array([0.0, -1.0]), 0.01, 0.01, 0.5
        )


_B01 = "/root/reference/tDCF_python_v2/scores/B01_LA_primary_eval.txt"


@pytest.mark.skipif(
    not __import__("os").path.exists(_B01),
    reason="official B01 baseline score file not present",
)
def test_eer_on_real_b01_baseline_scores():
    """Real-data golden: the official LFCC-GMM B01 primary CM scores
    (71k ASVspoof19-LA eval trials) shipped with tDCF_python_v2.  Expected
    values computed once with the official `eval_metrics.compute_eer`."""
    bona, spoof = [], []
    with open(_B01) as f:
        for line in f:
            parts = line.split()
            (bona if parts[4] == "bonafide" else spoof).append(float(parts[-1]))
    eer, thr = metrics.compute_eer(np.asarray(bona), np.asarray(spoof))
    assert eer * 100 == pytest.approx(9.5720, abs=5e-4)
    assert thr == pytest.approx(2.909863, abs=1e-5)
