"""End-to-end score-file evaluation tests (2019 report + 2021-DF breakdown)."""

import numpy as np
import pytest

from rade_tpu.evaluate import (
    calculate_eer_2021,
    calculate_tdcf_eer,
    codec_breakdown,
    write_codec_breakdown_report,
)


@pytest.fixture()
def score_files(tmp_path):
    rng = np.random.RandomState(99)
    attacks = [f"A{i:02d}" for i in range(7, 20)]
    cm_lines = []
    for i in range(300):
        cm_lines.append(f"LA_E_{i:07d} - bonafide {rng.normal(2.0, 1.0):.6f}")
    for i in range(900):
        src = attacks[i % len(attacks)]
        cm_lines.append(f"LA_E_9{i:06d} {src} spoof {rng.normal(-1.5, 1.2):.6f}")
    cm_path = tmp_path / "cm.txt"
    cm_path.write_text("\n".join(cm_lines) + "\n")

    asv_lines = []
    for i in range(200):
        asv_lines.append(f"- target {rng.normal(3.0, 1.0):.6f}")
    for i in range(200):
        asv_lines.append(f"- nontarget {rng.normal(-2.0, 1.0):.6f}")
    for i in range(400):
        asv_lines.append(f"A07 spoof {rng.normal(0.0, 1.5):.6f}")
    asv_path = tmp_path / "asv.txt"
    asv_path.write_text("\n".join(asv_lines) + "\n")
    return str(cm_path), str(asv_path)


def test_calculate_tdcf_eer_runs(score_files, tmp_path):
    cm, asv = score_files
    out = tmp_path / "report.txt"
    eer, min_tdcf = calculate_tdcf_eer(cm, asv, str(out), printout=True)
    assert 0.0 <= eer <= 100.0
    assert 0.0 <= min_tdcf <= 1.0 + 1e-9
    text = out.read_text()
    assert "CM SYSTEM" in text and "min-tDCF" in text and "EER A19" in text


def test_calculate_tdcf_eer_separable_scores(tmp_path):
    # Perfectly separable scores -> EER 0, min-tDCF 0.
    cm_lines = [f"u{i} - bonafide {10.0 + i}" for i in range(50)]
    cm_lines += [f"v{i} A07 spoof {-10.0 - i}" for i in range(50)]
    cm = tmp_path / "cm.txt"
    cm.write_text("\n".join(cm_lines) + "\n")
    asv_lines = [f"- target {5.0 + 0.01 * i}" for i in range(50)]
    asv_lines += [f"- nontarget {-5.0 - 0.01 * i}" for i in range(50)]
    asv_lines += [f"A07 spoof {-1.0 - 0.01 * i}" for i in range(50)]
    asv = tmp_path / "asv.txt"
    asv.write_text("\n".join(asv_lines) + "\n")
    eer, min_tdcf = calculate_tdcf_eer(str(cm), str(asv), printout=False)
    assert eer == pytest.approx(0.0)
    assert min_tdcf == pytest.approx(0.0)


@pytest.fixture()
def df2021_files(tmp_path):
    rng = np.random.RandomState(5)
    codecs = ["nocodec", "low_mp3", "high_mp3", "low_m4a"]
    sources = ["asvspoof", "vcc2018", "vcc2020"]
    meta_lines, score_lines = [], []
    for i in range(1200):
        utt = f"DF_E_{i:07d}"
        codec = codecs[i % len(codecs)]
        source = sources[i % len(sources)]
        is_bona = i % 5 == 0  # decorrelated from the codec (i % 4) / source (i % 3) cycles
        key = "bonafide" if is_bona else "spoof"
        attack = "-" if is_bona else f"A{7 + i % 13:02d}"
        meta_lines.append(f"LA_{i:04d} {utt} {codec} {source} {attack} {key} - eval")
        score = rng.normal(1.5 if is_bona else -1.0, 1.0)
        score_lines.append(f"{utt} {score:.6f}")
    key_path = tmp_path / "trial_metadata.txt"
    key_path.write_text("\n".join(meta_lines) + "\n")
    score_path = tmp_path / "scores.txt"
    score_path.write_text("\n".join(score_lines) + "\n")
    return str(score_path), str(key_path)


def test_calculate_eer_2021(df2021_files):
    scores, keys = df2021_files
    eer = calculate_eer_2021(scores, keys)
    assert 0.0 < eer < 50.0


def test_codec_breakdown_and_report(df2021_files, tmp_path):
    scores, keys = df2021_files
    overall, codecs, sources = codec_breakdown(scores, keys)
    assert set(codecs) == {"nocodec", "low_mp3", "high_mp3", "low_m4a"}
    assert set(sources) == {"asvspoof", "vcc2018", "vcc2020"}
    for eer, nb, ns in codecs.values():
        assert nb > 0 and ns > 0 and 0 <= eer <= 100
    out = tmp_path / "report.md"
    got = write_codec_breakdown_report(scores, keys, str(out))
    assert got == pytest.approx(overall)
    assert "Breakdown by Codec" in out.read_text()


def test_produce_evaluation_file_asserts_utt_order(tmp_path):
    """Per-utterance order assert, like the reference src/main.py:989-993."""
    from rade_tpu.evaluate.scorer import produce_evaluation_file

    class FakeBatcher:
        def __iter__(self):
            # scored in an order that disagrees with the trial file
            yield np.zeros((2, 4), np.float32), ["U2", "U1"], 2

    trial = tmp_path / "trial.txt"
    trial.write_text("S1 U1 - A07 spoof\nS2 U2 - - bonafide\n")

    def eval_step(params, batch_stats, x):
        return np.zeros(x.shape[0])

    with pytest.raises(ValueError, match="order mismatch"):
        produce_evaluation_file(
            eval_step, None, None, FakeBatcher(), trial, tmp_path / "out.txt"
        )

    class GoodBatcher:
        def __iter__(self):
            yield np.zeros((2, 4), np.float32), ["U1", "U2"], 2

    produce_evaluation_file(
        eval_step, None, None, GoodBatcher(), trial, tmp_path / "out.txt"
    )
    rows = (tmp_path / "out.txt").read_text().strip().splitlines()
    assert [r.split()[0] for r in rows] == ["U1", "U2"]
