"""Standalone t-DCF/EER evaluation CLI (the tDCF_python_v2 driver).

Equivalent of `/root/reference/tDCF_python_v2/evaluate_tDCF_asvspoof19.py`:
evaluate a CM score file against ASV scores with the legacy or revised t-DCF,
optionally saving score histograms and the t-DCF curve.

Usage:
  python -m rade_tpu.tools.evaluate_tdcf --cm_scores S --asv_scores A \
      [--legacy] [--plot out.png]
"""

from __future__ import annotations

import argparse

import numpy as np

from rade_tpu.evaluate.metrics import (
    compute_eer,
    compute_tdcf_legacy,
    compute_tdcf_revised,
    obtain_asv_error_rates,
)
from rade_tpu.evaluate.scoring import load_asv_scores, load_cm_scores


def evaluate(cm_scores_file, asv_score_file, legacy=False, plot=None):
    asv_keys, asv_scores = load_asv_scores(asv_score_file)
    _, _, cm_keys, cm_scores = load_cm_scores(cm_scores_file)

    tar = asv_scores[asv_keys == "target"]
    non = asv_scores[asv_keys == "nontarget"]
    spoof_asv = asv_scores[asv_keys == "spoof"]
    bona = cm_scores[cm_keys == "bonafide"]
    spoof = cm_scores[cm_keys == "spoof"]

    eer_asv, thr = compute_eer(tar, non)
    eer_cm = compute_eer(bona, spoof)[0]
    pfa, pmiss, pmiss_spoof, pfa_spoof = obtain_asv_error_rates(tar, non, spoof_asv, thr)

    if legacy:
        curve, thresholds = compute_tdcf_legacy(bona, spoof, pfa, pmiss, pmiss_spoof)
    else:
        curve, thresholds = compute_tdcf_revised(bona, spoof, pfa, pmiss, pfa_spoof)
    min_tdcf = float(np.min(curve))

    print(f"ASV EER            = {eer_asv * 100:8.5f} %")
    print(f"CM EER             = {eer_cm * 100:8.5f} %")
    print(f"min t-DCF ({'legacy' if legacy else 'revised'}) = {min_tdcf:8.5f}")

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
        ax1.hist(bona, bins=50, alpha=0.6, label="bonafide", density=True)
        ax1.hist(spoof, bins=50, alpha=0.6, label="spoof", density=True)
        ax1.set_title("CM score distributions")
        ax1.legend()
        ax2.plot(thresholds, curve)
        ax2.axhline(min_tdcf, ls="--", c="r", label=f"min t-DCF {min_tdcf:.4f}")
        ax2.set_title("normalized t-DCF curve")
        ax2.set_xlabel("CM threshold")
        ax2.legend()
        fig.tight_layout()
        fig.savefig(plot, dpi=140)
        print(f"plots -> {plot}")
    return eer_cm * 100, min_tdcf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cm_scores", required=True)
    ap.add_argument("--asv_scores", required=True)
    ap.add_argument("--legacy", action="store_true", help="2019 legacy t-DCF")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()
    evaluate(args.cm_scores, args.asv_scores, args.legacy, args.plot)


if __name__ == "__main__":
    main()
