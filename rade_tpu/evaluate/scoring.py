"""Score-file level evaluation: ASVspoof-2019 LA t-DCF/EER reports.

Reproduces the behavior of `/root/reference/src/evaluation.py:7-108`
(`calculate_tDCF_EER`): load a CM score file (``utt_id src key score`` lines)
plus the organizers' ASV score file, compute CM EER, per-attack EER breakdown
(A07..A19) and the minimum legacy t-DCF, and write a text report.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from .metrics import (
    ASVSPOOF19_LA_COST_MODEL,
    CostModel,
    compute_eer,
    compute_tdcf_legacy,
    obtain_asv_error_rates,
)

ATTACK_TYPES = [f"A{i:02d}" for i in range(7, 20)]


def load_cm_scores(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Load a CM score file with ``utt_id source key score`` rows."""
    utt, src, key, score = [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            utt.append(parts[0])
            src.append(parts[1])
            key.append(parts[2])
            score.append(float(parts[3]))
    return (
        np.asarray(utt),
        np.asarray(src),
        np.asarray(key),
        np.asarray(score, dtype=np.float64),
    )


def load_asv_scores(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load organizers' ASV scores (``source key score`` rows) -> (keys, scores)."""
    keys, scores = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            keys.append(parts[1])
            scores.append(float(parts[2]))
    return np.asarray(keys), np.asarray(scores, dtype=np.float64)


def calculate_tdcf_eer(
    cm_scores_file: str,
    asv_score_file: str,
    output_file: Optional[str] = None,
    printout: bool = True,
    cost_model: CostModel = ASVSPOOF19_LA_COST_MODEL,
) -> Tuple[float, float]:
    """CM EER (%) and min legacy t-DCF for a 2019-LA score file.

    Same cost model, attack breakdown and report format as the reference.
    """
    asv_keys, asv_scores = load_asv_scores(asv_score_file)
    _, cm_sources, cm_keys, cm_scores = load_cm_scores(cm_scores_file)

    tar_asv = asv_scores[asv_keys == "target"]
    non_asv = asv_scores[asv_keys == "nontarget"]
    spoof_asv = asv_scores[asv_keys == "spoof"]

    bona_cm = cm_scores[cm_keys == "bonafide"]
    spoof_cm = cm_scores[cm_keys == "spoof"]

    _, asv_threshold = compute_eer(tar_asv, non_asv)
    eer_cm = compute_eer(bona_cm, spoof_cm)[0]

    p_fa_asv, p_miss_asv, p_miss_spoof_asv, _ = obtain_asv_error_rates(
        tar_asv, non_asv, spoof_asv, asv_threshold
    )
    tdcf_curve, _ = compute_tdcf_legacy(
        bona_cm, spoof_cm, p_fa_asv, p_miss_asv, p_miss_spoof_asv, cost_model
    )
    min_tdcf = float(np.min(tdcf_curve))

    if printout:
        eer_breakdown: Dict[str, float] = {}
        for attack in ATTACK_TYPES:
            attack_scores = cm_scores[cm_sources == attack]
            if attack_scores.size:
                eer_breakdown[attack] = compute_eer(bona_cm, attack_scores)[0]
            else:
                eer_breakdown[attack] = float("nan")
        report = _format_report(eer_cm, min_tdcf, eer_breakdown)
        if output_file is not None:
            os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
            with open(output_file, "w") as f:
                f.write(report)
        print(report)

    return eer_cm * 100.0, min_tdcf


def _format_report(eer_cm: float, min_tdcf: float, breakdown: Dict[str, float]) -> str:
    lines = [
        "",
        "CM SYSTEM",
        f"\tEER\t\t= {eer_cm * 100:8.9f} % (Equal error rate for countermeasure)",
        "",
        "TANDEM",
        f"\tmin-tDCF\t\t= {min_tdcf:8.9f}",
        "",
        "BREAKDOWN CM SYSTEM",
    ]
    for attack, eer in breakdown.items():
        lines.append(
            f"\tEER {attack}\t\t= {eer * 100:8.9f} % (Equal error rate for {attack}"
        )
    return "\n".join(lines) + "\n"
