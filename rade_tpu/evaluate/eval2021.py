"""ASVspoof-2021 DF evaluation: EER + codec/source breakdowns.

The reference *calls* ``produce_evaluation_file_2021`` / ``calculate_EER_2021``
but ships without their module (`/root/reference/src/main.py:36,368-391` —
`evaluation_2021.py` is absent).  This module implements what those calls need:

- 2021 score files are ``utt_id score`` lines (score may be the last column);
- labels come from ``keys/DF/CM/trial_metadata.txt``
  (``SPK FILE CODEC SOURCE ATTACK KEY ...`` — key in column 6);
- EER uses the sign-robust min-flip convention of
  `/root/reference/src/report_2021df_codec_breakdown.py:10-38`.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from .metrics import compute_eer_minflip


@dataclasses.dataclass(frozen=True)
class TrialMeta:
    codec: str
    source: str
    key: str  # "bonafide" | "spoof"
    attack: str


def load_score_file(path: str) -> Dict[str, float]:
    """Parse ``utt_id [...] score`` lines; the score is the last float column."""
    scores: Dict[str, float] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            try:
                scores[parts[0]] = float(parts[-1])
            except ValueError:
                continue
    return scores


def load_trial_metadata(path: str) -> Dict[str, TrialMeta]:
    """Parse 2021-DF ``trial_metadata.txt`` into {utt_id: TrialMeta}."""
    meta: Dict[str, TrialMeta] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            meta[parts[1]] = TrialMeta(
                codec=parts[2], source=parts[3], attack=parts[4], key=parts[5]
            )
    return meta


def calculate_eer_2021(
    score_file: str, key_file: str, progress: bool = False
) -> float:
    """Overall min-flip EER (%) of a 2021-DF score file against its key file."""
    scores = load_score_file(score_file)
    meta = load_trial_metadata(key_file)
    bona, spoof = [], []
    for utt, s in scores.items():
        m = meta.get(utt)
        if m is None:
            continue
        (bona if m.key == "bonafide" else spoof).append(s)
    return compute_eer_minflip(np.asarray(bona), np.asarray(spoof))


def codec_breakdown(
    score_file: str, key_file: str
) -> Tuple[float, Dict[str, Tuple[float, int, int]], Dict[str, Tuple[float, int, int]]]:
    """(overall EER %, per-codec, per-source) breakdowns.

    Per-group values are ``(eer_percent, n_bonafide, n_spoof)`` with EER
    computed within-group (group bonafide vs group spoof), NaN when a side is
    empty — matching the reference report script.
    """
    scores = load_score_file(score_file)
    meta = load_trial_metadata(key_file)

    all_bona: List[float] = []
    all_spoof: List[float] = []
    by_codec: Dict[str, Tuple[List[float], List[float]]] = defaultdict(
        lambda: ([], [])
    )
    by_source: Dict[str, Tuple[List[float], List[float]]] = defaultdict(
        lambda: ([], [])
    )
    for utt, s in scores.items():
        m = meta.get(utt)
        if m is None:
            continue
        side = 0 if m.key == "bonafide" else 1
        (all_bona if side == 0 else all_spoof).append(s)
        by_codec[m.codec][side].append(s)
        by_source[m.source][side].append(s)

    overall = compute_eer_minflip(np.asarray(all_bona), np.asarray(all_spoof))

    def _summarize(groups):
        out = {}
        for name in sorted(groups):
            b, sp = groups[name]
            eer = (
                compute_eer_minflip(np.asarray(b), np.asarray(sp))
                if (b and sp)
                else float("nan")
            )
            out[name] = (eer, len(b), len(sp))
        return out

    return overall, _summarize(by_codec), _summarize(by_source)


def write_codec_breakdown_report(
    score_file: str, key_file: str, out_path: str
) -> float:
    """Markdown codec/source breakdown report; returns the overall EER (%)."""
    overall, codecs, sources = codec_breakdown(score_file, key_file)
    lines = [
        "# ASVspoof 2021 DF Report (Codec Breakdown)",
        "",
        f"- **Score file**: `{score_file}`",
        f"- **Key file**: `{key_file}`",
        f"- **Overall EER (minflip)**: **{overall:.3f}%**",
        "",
        "## Breakdown by Codec",
        "",
        "| Codec | EER (%) | Bonafide | Spoof | Total |",
        "| :--- | ---: | ---: | ---: | ---: |",
    ]
    for name, (eer, nb, ns) in codecs.items():
        lines.append(f"| {name} | {eer:.3f} | {nb} | {ns} | {nb + ns} |")
    lines += [
        "",
        "## Breakdown by Source Domain",
        "",
        "| Source | EER (%) | Bonafide | Spoof | Total |",
        "| :--- | ---: | ---: | ---: | ---: |",
    ]
    for name, (eer, nb, ns) in sources.items():
        lines.append(f"| {name} | {eer:.3f} | {nb} | {ns} | {nb + ns} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return overall
