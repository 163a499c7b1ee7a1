"""Hard-mode synthetic anchor data (non-saturating class boundary).

Round-3 verdict: the easy generator's anchor saturates (0.1% dev EER by
epoch 28), so recipe regressions stop moving the number.  Hard mode gives
each attack id A07-A19 a SUBTLE signature with strength draws that overlap
"almost clean", and adds nuisance artifacts to bonafide.
"""

import numpy as np

from rade_tpu.tools import synth_dataset as sd


def test_hard_attack_table_covers_a07_to_a19():
    assert sorted(sd._HARD_ATTACKS) == list(range(7, 20))


def test_signatures_are_subtle_at_low_strength_and_active_at_high():
    rng = np.random.RandomState(0)
    x = sd._bonafide(np.random.RandomState(1), 16000)
    for aid, fn in sd._HARD_ATTACKS.items():
        lo = fn(x.copy(), 0.05, np.random.RandomState(2))
        hi = fn(x.copy(), 0.9, np.random.RandomState(2))
        rel_lo = np.linalg.norm(lo - x) / np.linalg.norm(x)
        rel_hi = np.linalg.norm(hi - x) / np.linalg.norm(x)
        assert lo.shape == x.shape == hi.shape
        # low strength: close to clean; high strength: measurably different
        assert rel_lo < 0.6, (aid, rel_lo)
        assert rel_hi > rel_lo * 0.99, (aid, rel_lo, rel_hi)
        assert rel_hi > 1e-3, (aid, rel_hi)
        assert np.isfinite(hi).all()


def test_spoof_hard_is_normalized_and_deterministic():
    a = sd._spoof_hard(np.random.RandomState(5), 16000, 12)
    b = sd._spoof_hard(np.random.RandomState(5), 16000, 12)
    np.testing.assert_array_equal(a, b)
    assert 0.25 <= np.abs(a).max() <= 0.31


def test_generate_hard_layout(tmp_path):
    root = sd.generate(str(tmp_path / "la"), n_per_split=8, seed=3, hard=True)
    proto = root / "ASVspoof2019_LA_cm_protocols"
    lines = (proto / "ASVspoof2019.LA.cm.train.trn.txt").read_text().splitlines()
    assert len(lines) == 8
    labels = {ln.split()[-1] for ln in lines}
    assert labels == {"bonafide", "spoof"}
    attacks = {ln.split()[3] for ln in lines if ln.split()[-1] == "spoof"}
    assert attacks and all(a.startswith("A") for a in attacks)
    wavs = list((root / "ASVspoof2019_LA_train" / "flac").glob("*.wav"))
    assert len(wavs) == 8


def test_hard_classes_overlap_more_than_easy():
    """The hard task's spoof/bonafide high-band energy gap must be much
    smaller than the easy task's (the quantization+hard-AM signature is
    glaring above 4 kHz)."""

    def highband_frac(x):
        S = np.abs(np.fft.rfft(x)) ** 2
        return S[len(S) // 2 :].sum() / (S.sum() + 1e-12)

    rng = np.random.RandomState(0)
    n = 16000
    easy_gap, hard_gap = [], []
    for i in range(24):
        eb = highband_frac(sd._bonafide(np.random.RandomState(100 + i), n))
        es = highband_frac(sd._spoof(np.random.RandomState(100 + i), n))
        hb = highband_frac(sd._bonafide_hard(np.random.RandomState(200 + i), n))
        hs = highband_frac(
            sd._spoof_hard(np.random.RandomState(200 + i), n, 7 + i % 13)
        )
        easy_gap.append(es - eb)
        hard_gap.append(hs - hb)
    assert abs(np.mean(hard_gap)) < 0.5 * abs(np.mean(easy_gap))
