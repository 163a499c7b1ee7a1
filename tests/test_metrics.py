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


# ---------------------------------------------------------------------------
# Real-data goldens on the VENDORED official baseline score files.
#
# tests/data/B0{1,2}_LA_primary_eval.txt.gz are the official LFCC-GMM (B01)
# and CQCC-GMM (B02) primary CM score files over the 71,237 ASVspoof19-LA
# eval trials, shipped with the organizers' public tDCF_python_v2 package
# (vendored gzipped so the goldens run without /root/reference present).
# tests/data/asv_synth_scores.txt is a SYNTHESIZED ASV score file (the
# official ASV blobs were stripped from the reference): seeded normals,
# target ~ N(2,1) x2000, nontarget ~ N(-2,1.2) x2000, spoof ~ N(0,1.8)
# x4000, RandomState(20190402).  All expected values below were computed
# once with the official `tDCF_python_v2/eval_metrics.py` implementation.
# ---------------------------------------------------------------------------

import gzip
import os

_DATA = os.path.join(os.path.dirname(__file__), "data")

# (eer%, thr, min_tdcf_legacy, min_tdcf_revised) from the official package
_BASELINE_GOLDENS = {
    "B01": (9.572028, 2.909863, 0.26551356, 0.37745454),
    "B02": (8.089825, 1.030046, 0.24079617, 0.35650426),
}


def _load_vendored_cm(name):
    bona, spoof = [], []
    with gzip.open(
        os.path.join(_DATA, f"{name}_LA_primary_eval.txt.gz"), "rt"
    ) as f:
        for line in f:
            parts = line.split()
            (bona if parts[4] == "bonafide" else spoof).append(float(parts[-1]))
    return np.asarray(bona), np.asarray(spoof)


def _load_vendored_asv():
    tar, non, spf = [], [], []
    with open(os.path.join(_DATA, "asv_synth_scores.txt")) as f:
        for line in f:
            _, kind, score = line.split()
            {"target": tar, "nontarget": non, "spoof": spf}[kind].append(
                float(score)
            )
    return np.asarray(tar), np.asarray(non), np.asarray(spf)


@pytest.mark.parametrize("name", ["B01", "B02"])
def test_eer_and_tdcf_on_vendored_baseline_scores(name):
    """Real-data golden: official baseline CM scores + synthesized ASV."""
    bona, spoof = _load_vendored_cm(name)
    assert len(bona) == 7355 and len(spoof) == 63882
    exp_eer, exp_thr, exp_legacy, exp_rev = _BASELINE_GOLDENS[name]
    eer, thr = metrics.compute_eer(bona, spoof)
    assert eer * 100 == pytest.approx(exp_eer, abs=5e-5)
    assert thr == pytest.approx(exp_thr, abs=1e-5)

    tar, non, spf = _load_vendored_asv()
    _, asv_thr = metrics.compute_eer(tar, non)
    pfa, pmiss, pmiss_spoof, pfa_spoof = metrics.obtain_asv_error_rates(
        tar, non, spf, asv_thr
    )
    assert (pfa, pmiss) == pytest.approx((0.0415, 0.0410), abs=1e-9)
    tdcf_l, _ = metrics.compute_tdcf_legacy(bona, spoof, pfa, pmiss, pmiss_spoof)
    assert float(np.min(tdcf_l)) == pytest.approx(exp_legacy, abs=1e-7)
    tdcf_r, _ = metrics.compute_tdcf_revised(bona, spoof, pfa, pmiss, pfa_spoof)
    assert float(np.min(tdcf_r)) == pytest.approx(exp_rev, abs=1e-7)
