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


# Real LA split sizes (protocol line counts of the reference dataset),
# for full-scale pipeline benchmarks: train 25,380 / dev 24,844 / eval 71,237.
LA_SIZES = {"train": 25380, "dev": 24844, "eval": 71237}


def generate(
    out_dir: str,
    n_per_split: int = 40,
    seed: int = 0,
    fmt: str = "wav",
    split_sizes: "dict[str, int] | None" = None,
    duration_range: "tuple[float, float] | None" = None,
) -> Path:
    """Generate the synthetic LA layout.

    ``fmt='flac'`` writes FLAC via the native encoder (flacenc.cpp), giving
    the pipeline benchmark the same decode cost profile as the real LA data;
    ``split_sizes`` overrides per-split counts (e.g. ``LA_SIZES`` for a
    real-size set); utterance durations are log-normal around ~3.2 s,
    clipped to [1.2, 10] s, approximating the LA duration distribution
    (override with ``duration_range`` for a uniform draw).
    """
    root = Path(out_dir)
    rng = np.random.RandomState(seed)
    proto_dir = root / "ASVspoof2019_LA_cm_protocols"
    proto_dir.mkdir(parents=True, exist_ok=True)
    if fmt == "flac":
        from rade_tpu.native.loader import encode_flac16
    split_names = {
        "train": ("ASVspoof2019_LA_train", "ASVspoof2019.LA.cm.train.trn.txt"),
        "dev": ("ASVspoof2019_LA_dev", "ASVspoof2019.LA.cm.dev.trl.txt"),
        "eval": ("ASVspoof2019_LA_eval", "ASVspoof2019.LA.cm.eval.trl.txt"),
    }
    for split, (dirname, protoname) in split_names.items():
        n_split = (split_sizes or {}).get(split, n_per_split)
        flac_dir = root / dirname / "flac"
        flac_dir.mkdir(parents=True, exist_ok=True)
        lines = []
        for i in range(n_split):
            key = f"LA_{split.upper()[0]}_{i:07d}"
            is_bona = i % 2 == 0
            if duration_range is not None:
                dur = rng.uniform(*duration_range)
            else:
                dur = float(np.clip(np.exp(rng.normal(np.log(3.2), 0.35)), 1.2, 10.0))
            n = int(dur * SR)
            x = _bonafide(rng, n) if is_bona else _spoof(rng, n)
            if fmt == "flac":
                (flac_dir / f"{key}.flac").write_bytes(encode_flac16(x, SR))
            else:
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


def generate_2021_df(
    out_dir: str, n: int = 64, seed: int = 0, fmt: str = "wav"
) -> "tuple[Path, Path]":
    """Synthetic ASVspoof2021-DF eval layout for the cross-domain auto-eval.

    Writes ``<out>/flac/`` + ``ASVspoof2021.DF.cm.eval.trl.txt`` + a keys
    ``trial_metadata.txt`` (``SPK FILE CODEC SOURCE ATTACK KEY - eval``,
    key in column 6 — `/root/reference/src/report_2021df_codec_breakdown.py:63-71`)
    spanning several codecs/sources so the codec breakdown report has real
    strata.  Returns ``(db_root, key_file)``.
    """
    root = Path(out_dir)
    rng = np.random.RandomState(seed)
    flac_dir = root / "flac"
    flac_dir.mkdir(parents=True, exist_ok=True)
    if fmt == "flac":
        from rade_tpu.native.loader import encode_flac16
    codecs = ["nocodec", "low_mp3", "high_m4a", "ogg"]
    sources = ["asvspoof", "vcc2018", "vcc2020"]
    trial_lines, meta_lines = [], []
    for i in range(n):
        utt = f"DF_E_{i:07d}"
        is_bona = i % 2 == 0
        dur = float(np.clip(np.exp(rng.normal(np.log(3.2), 0.35)), 1.2, 10.0))
        ns = int(dur * SR)
        x = _bonafide(rng, ns) if is_bona else _spoof(rng, ns)
        if fmt == "flac":
            (flac_dir / f"{utt}.flac").write_bytes(encode_flac16(x, SR))
        else:
            write_wav(flac_dir / f"{utt}.wav", x, SR)
        key = "bonafide" if is_bona else "spoof"
        # decorrelate strata from the i%2 label so every codec/source cell
        # holds both classes (the breakdown EERs are defined)
        codec = codecs[int(rng.randint(len(codecs)))]
        source = sources[int(rng.randint(len(sources)))]
        attack = "-" if is_bona else f"A{7 + i % 13:02d}"
        line = f"LA_{i:04d} {utt} {codec} {source} {attack} {key} - eval"
        trial_lines.append(line)
        meta_lines.append(line)
    (root / "ASVspoof2021.DF.cm.eval.trl.txt").write_text(
        "\n".join(trial_lines) + "\n"
    )
    key_file = root / "trial_metadata.txt"
    key_file.write_text("\n".join(meta_lines) + "\n")
    return root, key_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--format", choices=["wav", "flac"], default="wav")
    ap.add_argument(
        "--la-size", action="store_true",
        help="real LA split sizes (25,380 / 24,844 / 71,237 utterances)",
    )
    ap.add_argument("--train-only", action="store_true",
                    help="with --la-size: full-size train split, --n dev/eval")
    ap.add_argument(
        "--df2021", action="store_true",
        help="also write a synthetic ASVspoof2021-DF eval layout "
             "(<out>_df21/) for the cross-domain auto-eval",
    )
    args = ap.parse_args()
    sizes = None
    if args.la_size:
        sizes = dict(LA_SIZES)
        if args.train_only:
            sizes["dev"] = args.n
            sizes["eval"] = args.n
    root = generate(args.out, args.n, args.seed, fmt=args.format, split_sizes=sizes)
    print(f"synthetic LA dataset at {root}")
    if args.df2021:
        db, keys = generate_2021_df(
            args.out.rstrip("/") + "_df21", n=max(args.n, 32),
            seed=args.seed + 7, fmt=args.format,
        )
        print(f"synthetic 2021-DF layout at {db} (keys: {keys})")


if __name__ == "__main__":
    main()
