"""Synthetic miniature ASVspoof2019-LA dataset generator (for tests/CI).

Creates the exact directory layout the reference trainer expects
(`ASVspoof2019_LA_{train,dev,eval}/flac/` + `ASVspoof2019_LA_cm_protocols/`)
with short WAV utterances: "bonafide" = harmonic tones + noise, "spoof" =
phase-scrambled/AM-distorted versions, so a model can actually separate the
classes.  Also writes a synthetic ASV score file so t-DCF is computable.

Usage: python -m rade_tpu.tools.synth_dataset --out /tmp/synthla [--n 40]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from rade_tpu.data.audio_io import write_wav

SR = 16000


def _bonafide(rng: np.random.RandomState, n: int) -> np.ndarray:
    t = np.arange(n) / SR
    f0 = rng.uniform(90, 250)
    x = np.zeros(n)
    for k in range(1, 6):
        x += rng.uniform(0.2, 1.0) / k * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28))
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t))
    x = x * env + 0.01 * rng.randn(n)
    return 0.3 * x / (np.abs(x).max() + 1e-9)

def _spoof(rng: np.random.RandomState, n: int) -> np.ndarray:
    x = _bonafide(rng, n)
    # vocoder-ish artifacts: hard AM at an audible rate + spectral notch + quantization
    t = np.arange(n) / SR
    x = x * (0.6 + 0.4 * np.sign(np.sin(2 * np.pi * rng.uniform(20, 60) * t)))
    x = np.round(x * 64) / 64
    return x


def generate(out_dir: str, n_per_split: int = 40, seed: int = 0) -> Path:
    root = Path(out_dir)
    rng = np.random.RandomState(seed)
    proto_dir = root / "ASVspoof2019_LA_cm_protocols"
    proto_dir.mkdir(parents=True, exist_ok=True)
    split_names = {
        "train": ("ASVspoof2019_LA_train", "ASVspoof2019.LA.cm.train.trn.txt"),
        "dev": ("ASVspoof2019_LA_dev", "ASVspoof2019.LA.cm.dev.trl.txt"),
        "eval": ("ASVspoof2019_LA_eval", "ASVspoof2019.LA.cm.eval.trl.txt"),
    }
    for split, (dirname, protoname) in split_names.items():
        flac_dir = root / dirname / "flac"
        flac_dir.mkdir(parents=True, exist_ok=True)
        lines = []
        for i in range(n_per_split):
            key = f"LA_{split.upper()[0]}_{i:07d}"
            is_bona = i % 2 == 0
            n = int(rng.uniform(0.8, 4.5) * SR)
            x = _bonafide(rng, n) if is_bona else _spoof(rng, n)
            write_wav(flac_dir / f"{key}.wav", x, SR)
            label = "bonafide" if is_bona else "spoof"
            attack = "-" if is_bona else f"A{7 + i % 13:02d}"
            lines.append(f"LA_{i:04d} {key} - {attack} {label}")
        (proto_dir / protoname).write_text("\n".join(lines) + "\n")

    # synthetic ASV scores for the t-DCF tandem term
    asv_rng = np.random.RandomState(seed + 1)
    asv_lines = []
    for _ in range(200):
        asv_lines.append(f"- target {asv_rng.normal(2.5, 1.0):.6f}")
        asv_lines.append(f"- nontarget {asv_rng.normal(-2.5, 1.0):.6f}")
        asv_lines.append(f"A07 spoof {asv_rng.normal(0.0, 1.5):.6f}")
    asv_path = root / "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt"
    asv_path.write_text("\n".join(asv_lines) + "\n")
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    root = generate(args.out, args.n, args.seed)
    print(f"synthetic LA dataset at {root}")


if __name__ == "__main__":
    main()
