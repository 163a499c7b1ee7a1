"""Per-attack EER breakdown report for ASVspoof2019-LA score files.

Offline analysis equivalent of `/root/reference/src/analyze_breakdown.py`:
parses ``utt_id src key score`` lines, computes overall and per-attack EER
(each attack's spoof scores vs all bonafide scores), and writes a markdown
report grouped by attack family.

Usage: python -m rade_tpu.tools.analyze_breakdown --score_file S --out R.md
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from rade_tpu.evaluate.metrics import compute_eer

ATTACK_TYPES_2019_LA = {
    "A07": "TTS (Vocoder)", "A08": "TTS (Vocoder)", "A09": "TTS (Vocoder)",
    "A10": "TTS (Vocoder)", "A11": "TTS (Vocoder)", "A12": "TTS (Vocoder)",
    "A13": "TTS-VC", "A14": "TTS-VC", "A15": "TTS-VC",
    "A16": "TTS (Waveform)", "A17": "VC (Vocoder)", "A18": "VC (Vocoder)",
    "A19": "VC (Waveform)", "-": "Bonafide/Unknown",
}


def read_scores(score_file: str):
    """-> (bonafide_scores, {attack: spoof_scores}, all_spoof_scores)."""
    bona: List[float] = []
    by_src: Dict[str, List[float]] = defaultdict(list)
    all_spoof: List[float] = []
    with open(score_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            try:
                score = float(parts[3])
            except ValueError:
                continue
            if parts[2] == "bonafide":
                bona.append(score)
            else:
                by_src[parts[1]].append(score)
                all_spoof.append(score)
    return bona, dict(by_src), all_spoof


def breakdown(score_file: str) -> Tuple[float, Dict[str, Tuple[float, int]]]:
    """(overall EER %, {attack: (EER %, count)})."""
    bona, by_src, all_spoof = read_scores(score_file)
    bona_a = np.asarray(bona)
    overall = 100.0 * compute_eer(bona_a, np.asarray(all_spoof))[0]
    per_attack = {}
    for src in sorted(by_src):
        scores = np.asarray(by_src[src])
        eer = 100.0 * compute_eer(bona_a, scores)[0] if scores.size else float("nan")
        per_attack[src] = (eer, scores.size)
    return overall, per_attack


def write_markdown_report(score_file: str, out_path: str, model_name: str = "Model") -> float:
    overall, per_attack = breakdown(score_file)
    bona, _, all_spoof = read_scores(score_file)
    lines = [
        f"# {model_name} Performance Breakdown",
        "",
        f"- **Score file**: `{score_file}`",
        f"- **Bonafide count**: {len(bona)}",
        f"- **Spoof count**: {len(all_spoof)}",
        f"- **Overall EER**: **{overall:.3f}%**",
        "",
        "## Breakdown by Attack Type (ASVspoof2019 LA)",
        "",
        "| Attack ID | Type | EER (%) | Count |",
        "| :--- | :--- | ---: | ---: |",
    ]
    for src, (eer, count) in per_attack.items():
        family = ATTACK_TYPES_2019_LA.get(src, "Unknown")
        lines.append(f"| {src} | {family} | {eer:.3f} | {count} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return overall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score_file", required=True)
    ap.add_argument("--out", default="breakdown_report.md")
    ap.add_argument("--model_name", default="Model")
    args = ap.parse_args()
    overall = write_markdown_report(args.score_file, args.out, args.model_name)
    print(f"overall EER {overall:.3f}% -> {args.out}")


if __name__ == "__main__":
    main()
