"""Model-evolution chart: EER across phases (clean vs compressed).

Equivalent of `/root/reference/docs/plot_evolution.py` (the README chart);
the canonical reference numbers are the defaults — pass your own results to
plot a new framework's trajectory.

Usage: python -m rade_tpu.tools.plot_evolution [--out evolution.png]
"""

from __future__ import annotations

import argparse

# Canonical published numbers (reference README.md:87-92 / docs/plot_evolution.py:26-31)
PHASES = ["Phase 3\nMoE-Mamba", "Phase 4\nDual-Stream", "Phase 5\nBi-Mamba+LoRA", "Phase 6\nFinal"]
CLEAN_EER = [23.0, 7.7, 4.49, 4.42]
COMPRESSED_EER = [45.0, 30.0, 20.0, 4.03]


def plot(out_path: str, clean=None, compressed=None, labels=None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = labels or PHASES
    clean = clean or CLEAN_EER
    compressed = compressed or COMPRESSED_EER
    x = range(len(labels))
    plt.figure(figsize=(8, 5))
    plt.plot(x, clean, "o-", label="Clean EER (%)", color="#27649c")
    plt.plot(x, compressed, "s--", label="Compressed EER (%)", color="#c2503a")
    for xi, (c, m) in enumerate(zip(clean, compressed)):
        plt.annotate(f"{c:g}", (xi, c), textcoords="offset points", xytext=(0, 8))
        plt.annotate(f"{m:g}", (xi, m), textcoords="offset points", xytext=(0, 8))
    plt.xticks(list(x), labels)
    plt.ylabel("EER (%)")
    plt.title("Anti-Spoofing Model Evolution (ASVspoof2019-LA)")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evolution.png")
    args = ap.parse_args()
    print(f"chart -> {plot(args.out)}")


if __name__ == "__main__":
    main()
