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


# --------------------------------------------------------------- hard mode
# The original spoof signature (hard 40% AM + 6-bit quantization) saturates:
# the 30-epoch flagship anchor reaches 0.1% dev EER by epoch 28, so recipe
# regressions no longer move the number.  Hard mode gives each attack id its
# own signature whose strength is drawn from a range overlapping "almost
# clean", and adds recording-style nuisance artifacts to bonafide too — the
# class boundary is real but noisy, targeting a 5-15% dev-EER plateau.
#
# Calibration history (exp_result/LA_Phase6_AnchorHard_*, 30-epoch flagship
# runs on the real chip): v1 (s∈[0.08,0.8], shallow transforms) plateaued at
# 43.5% dev EER — signatures under the RawBoost/codec augmentation noise
# floor; v2 (s∈[0.25,0.95], deepened) reached 42.1% still falling — a slope
# but no mid-band plateau.  v3 (these coefficients) makes three structural
# changes, each validated against a linear proxy classifier
# (benchmarks/anchor_proxy.py) before committing TPU hours:
#   1. per-attack CONSISTENT parameters (fixed notch center, fixed AM/warble
#      rates, fixed echo delay) — real ASVspoof attacks are per-algorithm
#      consistent; v1/v2 drew them per-utterance, leaving no stable cue;
#   2. a weak SHARED vocoder floor (hiss + requantization) under every
#      attack, like real TTS/VC systems share vocoder artifact families;
#   3. bonafide nuisance at FIXED shallow depths, decoupled from the spoof
#      coefficients (v1/v2 scaled both together — a calibration treadmill).
# Proxy EER: easy 0.0%, v2 (disk) 34%, v3-draft 7-10%, v4 5.0-5.5%, v5
# (these coefficients: the shared floor moved into the modulation+tonal
# family) 2.7% across seeds.  The clean-feature proxy and the AUGMENTED
# flagship learn DIFFERENT cue families (v3 per-attack analysis,
# docs/BENCH_NOTES.md round 5): RawBoost's SNR-10dB training noise masks
# hiss/requant/notch cues the proxy finds trivial, while modulation/tonal
# cues survive augmentation — so v4's deeper hiss+quant shared floor moved
# the flagship only 2 points (30.5 vs 32.6 at ep30) and v5's AM+hum floor
# finally calibrated it: 30-epoch flagship run
# LA_Phase6_AnchorHard5_ep30_bs16_v5 plateaus at 4.5% dev / 8.0% eval EER,
# and the FGM-off broken-recipe arm separates by 18 points at epoch 5
# (the committed sensitivity proof).

def _soft_clip(x, s):
    d = 1.0 + 28.0 * s
    return np.tanh(x * d) / np.tanh(d)


def _quant(x, s):  # coarse requantization: ~5 bits (subtle) .. ~2.5 bits
    bits = 6.5 - 4.0 * s
    q = 2.0 ** (bits - 1)
    return np.round(x * q) / q


def _am(x, s, rng):  # amplitude modulation at a per-ATTACK consistent rate
    t = np.arange(len(x)) / SR
    rate = 45.0 * rng.uniform(0.9, 1.1)
    return x * (1.0 - 0.8 * s + 0.8 * s * np.sin(2 * np.pi * rate * t))


def _notch(x, s, rng):  # deep notch at a FIXED center (consistent signature)
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1 / SR)
    c = 2800.0 * rng.uniform(0.95, 1.05)
    w = 150 + 900 * s
    X *= 1.0 - (0.5 + 0.5 * s) * np.exp(-0.5 * ((f - c) / w) ** 2)
    return np.fft.irfft(X, len(x))


def _hum(x, s, rng):  # mains hum + 3 harmonics
    t = np.arange(len(x)) / SR
    a = 0.35 * s
    y = x.copy()
    for k, g in ((1, 1.0), (3, 0.6), (5, 0.35)):
        y = y + a * g * np.sin(2 * np.pi * 50 * k * t + rng.uniform(0, 6.28))
    return y


def _smear(x, s, rng):  # reverb tail + a discrete echo at a fixed delay
    k = int(64 + 640 * s)
    h = np.exp(-np.arange(k) / (16 + 200 * s))
    h /= h.sum()
    y = np.convolve(x, h)[: len(x)]
    d = int(0.025 * SR)  # 25 ms slapback echo: comb ripple at 40 Hz spacing
    e = np.concatenate([np.zeros(d), x[:-d]])
    m = 0.4 + 0.55 * s
    z = (1.0 - m) * x + m * (0.55 * y + 0.45 * e)
    # reverberant recordings also muffle: high-shelf cut above ~3.5 kHz
    Z = np.fft.rfft(z)
    f = np.fft.rfftfreq(len(z), 1 / SR)
    Z[f > 3500] *= 1.0 - (0.3 + 0.5 * s)
    return np.fft.irfft(Z, len(z))


def _phase_rand(x, s, rng):  # broadband phase scramble (envelope collapse)
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1 / SR)
    m = f > 400.0
    X[m] *= np.exp(1j * min(1.0, 1.4 * s) * rng.uniform(-np.pi, np.pi, m.sum()))
    return np.fft.irfft(X, len(x))


def _hiss(x, s, rng):  # band-passed noise floor
    w = rng.randn(len(x))
    W = np.fft.rfft(w)
    f = np.fft.rfftfreq(len(x), 1 / SR)
    W[(f < 1500) | (f > 6000)] = 0
    w = np.fft.irfft(W, len(x))
    w /= np.abs(w).max() + 1e-9
    return x + 0.15 * s * w


def _pitch_warp(x, s, rng):  # vibrato + coupled tremolo (audible warble)
    t = np.arange(len(x))
    rate = 5.5 * rng.uniform(0.9, 1.1)  # Hz, consistent warble rate
    dev = 0.12 * s * SR / (2 * np.pi * rate)
    idx = np.clip(t + dev * np.sin(2 * np.pi * rate * t / SR), 0, len(x) - 1)
    y = np.interp(idx, t, x)
    return y * (1.0 - 0.3 * s + 0.3 * s * np.sin(2 * np.pi * rate * t / SR))


_HARD_ATTACKS = {  # A07..A19 -> per-attack signature
    7: lambda x, s, r: _quant(x, s),
    8: _am,
    9: _notch,
    10: _hum,
    11: _smear,
    12: _phase_rand,
    13: _hiss,
    14: _pitch_warp,
    15: lambda x, s, r: _soft_clip(x, s),
    16: lambda x, s, r: _am(_quant(x, 0.6 * s), 0.7 * s, r),
    17: lambda x, s, r: _hiss(_notch(x, 0.7 * s, r), 0.7 * s, r),
    18: lambda x, s, r: _smear(_phase_rand(x, 0.7 * s, r), 0.6 * s, r),
    19: lambda x, s, r: _pitch_warp(_hum(x, 0.7 * s, r), 0.7 * s, r),
}


def _bonafide_hard(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Bonafide with recording-style nuisance artifacts (class overlap).

    Nuisance depths are FIXED absolute values, decoupled from the spoof
    transform coefficients — v1/v2 reused the (then-shallow) spoof
    transforms at a scaled strength, which meant every deepening of the
    spoof signatures deepened the bonafide artifacts proportionally and the
    class overlap never shrank (the v1->v2 calibration treadmill).
    """
    x = _bonafide(rng, n)
    t = np.arange(n) / SR
    if rng.rand() < 0.3:  # some genuine recordings are slightly clipped
        d = rng.uniform(1.0, 2.2)
        x = np.tanh(x * d) / np.tanh(d)
    if rng.rand() < 0.3:  # or carry a faint broadband noise floor
        x = x + rng.uniform(0.0, 0.008) * rng.randn(n)
    if rng.rand() < 0.2:  # or a faint 50 Hz hum
        x = x + rng.uniform(0.0, 0.008) * np.sin(2 * np.pi * 50 * t)
    return x


def _spoof_hard(rng: np.random.RandomState, n: int, attack: int) -> np.ndarray:
    """Per-attack signature at an overlapping strength draw (v3).

    The floor keeps the weak end learnable (v1's 0.08 floor buried it under
    the training augmentation); composite attacks 16-19 scale component
    strengths by 0.6-0.7x, so their draw floor is raised to 0.5 to keep the
    effective component strength (>=0.3) well above the bonafide nuisance
    depths — the round-4 advisor flagged the v2 floor as partially breaking
    that invariant.
    """
    x = _bonafide_hard(rng, n)
    s = rng.uniform(0.6, 1.0) if attack >= 16 else rng.uniform(0.5, 1.0)
    y = _HARD_ATTACKS[attack](x, s, rng)
    # Shared vocoder floor: like real TTS/VC systems, every attack carries
    # a weak common artifact family on top of its own signature, so no
    # attack is *purely* its per-attack transform.  v5 lesson (per-attack
    # EERs of run LA_Phase6_AnchorHard_ep30_bs16_v3): the AUGMENTED
    # flagship only learns cues RawBoost does not emulate — modulation and
    # tonal components (AM 14.3 / hum 9.1 / am-quant 13.0 / vibrato-hum
    # 13.4 % EER) — while noise-like cues the linear proxy loved (hiss,
    # requant, notch, clip: 34-42%) are masked by the SNR-10dB training
    # noise.  So the shared floor is modulation+tonal (learnable by the
    # flagship THROUGH augmentation), with the v4 hiss+requant floor kept
    # beneath it for realism.
    y = _am(y, 0.45 * s, rng)
    y = _hum(y, 0.35 * s, rng)
    y = _hiss(y, 0.4 * s, rng)
    y = _quant(y, 0.45 * s)
    return 0.3 * y / (np.abs(y).max() + 1e-9)


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
    hard: bool = False,
) -> Path:
    """Generate the synthetic LA layout.

    ``fmt='flac'`` writes FLAC via the native encoder (flacenc.cpp), giving
    the pipeline benchmark the same decode cost profile as the real LA data;
    ``split_sizes`` overrides per-split counts (e.g. ``LA_SIZES`` for a
    real-size set); utterance durations are log-normal around ~3.2 s,
    clipped to [1.2, 10] s, approximating the LA duration distribution
    (override with ``duration_range`` for a uniform draw).  ``hard=True``
    uses the subtle per-attack signatures (`_spoof_hard`) + nuisance-laden
    bonafide so the anchor task doesn't saturate at ~0% EER.
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
            attack_id = 7 + i % 13
            if hard:
                x = (
                    _bonafide_hard(rng, n)
                    if is_bona
                    else _spoof_hard(rng, n, attack_id)
                )
            else:
                x = _bonafide(rng, n) if is_bona else _spoof(rng, n)
            if fmt == "flac":
                (flac_dir / f"{key}.flac").write_bytes(encode_flac16(x, SR))
            else:
                write_wav(flac_dir / f"{key}.wav", x, SR)
            label = "bonafide" if is_bona else "spoof"
            attack = "-" if is_bona else f"A{attack_id:02d}"
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
        "--hard", action="store_true",
        help="subtle per-attack signatures + nuisance bonafide (the "
             "non-saturating anchor task; targets a 5-15%% dev-EER plateau)",
    )
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
    root = generate(
        args.out, args.n, args.seed, fmt=args.format, split_sizes=sizes,
        hard=args.hard,
    )
    print(f"synthetic LA dataset at {root}")
    if args.df2021:
        db, keys = generate_2021_df(
            args.out.rstrip("/") + "_df21", n=max(args.n, 32),
            seed=args.seed + 7, fmt=args.format,
        )
        print(f"synthetic 2021-DF layout at {db} (keys: {keys})")


if __name__ == "__main__":
    main()
