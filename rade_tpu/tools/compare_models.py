"""Side-by-side per-attack EER comparison of two score files.

Equivalent of `/root/reference/utils/compare_models.py`.

Usage: python -m rade_tpu.tools.compare_models --a S1 --b S2 [--out R.md]
"""

from __future__ import annotations

import argparse

from .analyze_breakdown import ATTACK_TYPES_2019_LA, breakdown


def compare(score_a: str, score_b: str, name_a="A", name_b="B") -> str:
    overall_a, per_a = breakdown(score_a)
    overall_b, per_b = breakdown(score_b)
    lines = [
        f"# Model Comparison: {name_a} vs {name_b}",
        "",
        f"- **{name_a}**: `{score_a}` — overall EER {overall_a:.3f}%",
        f"- **{name_b}**: `{score_b}` — overall EER {overall_b:.3f}%",
        "",
        "| Attack | Type | " + f"{name_a} EER (%) | {name_b} EER (%) | Δ |",
        "| :--- | :--- | ---: | ---: | ---: |",
    ]
    for src in sorted(set(per_a) | set(per_b)):
        ea = per_a.get(src, (float("nan"), 0))[0]
        eb = per_b.get(src, (float("nan"), 0))[0]
        family = ATTACK_TYPES_2019_LA.get(src, "Unknown")
        lines.append(f"| {src} | {family} | {ea:.3f} | {eb:.3f} | {eb - ea:+.3f} |")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--name_a", default="Model A")
    ap.add_argument("--name_b", default="Model B")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = compare(args.a, args.b, args.name_a, args.name_b)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
    print(report)


if __name__ == "__main__":
    main()
