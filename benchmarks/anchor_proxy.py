"""Cheap CPU proxy for hard-anchor difficulty calibration.

The hard synthetic anchor (tools/synth_dataset.py --hard) must land its
30-epoch flagship dev-EER plateau in the 5-15% band to be an informative
regression anchor (round-4 verdict item 2).  A flagship run costs ~1.5-2.5 h
of TPU; this proxy costs ~1 min of CPU and calibrates the signature-depth
knobs BEFORE committing hardware time.

Method: a ridge classifier on hand spectral features (band log-energies
mean/std over time, envelope modulation spectrum, spectral flatness),
trained on AUGMENTED samples (stationary noise SNR 10-40 dB + codec-style
down/up resample, approximating the training recipe's RawBoost p=0.8 +
codec p=0.3) and scored on clean held-out samples — the same
train-noisy/score-clean asymmetry the anchor run has.

Reference points measured with this proxy (n=300-500, seeds 0/42):
  easy signatures (_spoof):       proxy EER  0.0%      (flagship: 0.1%)
  hard v2 (synthla2k_hard2 disk): proxy EER 34.0%      (flagship: 42.1%)
  hard v3 (this code):            proxy EER 6.8-9.6%   (flagship: target 5-15%)
Calibration findings that got v3 from 33% to <10% proxy EER: per-attack
consistent transform parameters (fixed notch center / AM rate / echo delay
— random per-utterance parameters leave no learnable cue), a weak shared
vocoder floor under every attack, and bonafide nuisance at fixed absolute
depths decoupled from the spoof coefficients.

Usage: python benchmarks/anchor_proxy.py [--n 400] [--v2-dir /root/data/synthla2k_hard2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rade_tpu.tools import synth_dataset as sd

SR = 16000
CROP = 3 * SR


def _crop(x: np.ndarray) -> np.ndarray:
    if len(x) >= CROP:
        return x[:CROP]
    reps = CROP // len(x) + 1
    return np.tile(x, reps)[:CROP]


def _augment(x: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Approximate the training recipe's RawBoost+codec augmentation."""
    if rng.rand() < 0.8:  # stationary noise, SNR uniform [10, 40] dB
        snr = rng.uniform(10, 40)
        p_sig = np.mean(x**2) + 1e-12
        p_noise = p_sig / (10 ** (snr / 10))
        x = x + rng.randn(len(x)) * np.sqrt(p_noise)
    if rng.rand() < 0.15:  # codec sim: down/up resample (16k -> {8,6,4}k)
        fac = rng.choice([2, 3, 4])
        # cheap decimate/interp stand-in for the polyphase resampler
        lo = x[::fac]
        x = np.interp(np.arange(len(x)) / fac, np.arange(len(lo)), lo)
    return x


def _features(x: np.ndarray) -> np.ndarray:
    """Band log-energies (mean+std), modulation spectrum, flatness."""
    x = _crop(x).astype(np.float64)
    frame, hop = 512, 256
    n_frames = (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(frame)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))  # (T, 257)
    nb = 40
    edges = np.linspace(0, mag.shape[1], nb + 1).astype(int)
    bands = np.stack(
        [mag[:, a:b].mean(axis=1) for a, b in zip(edges[:-1], edges[1:])], 1
    )  # (T, nb)
    logb = np.log(bands + 1e-8)
    feat = [logb.mean(0), logb.std(0)]
    # envelope modulation spectrum over 4 coarse bands (catches AM/smear)
    env = bands.reshape(n_frames, 4, nb // 4).mean(axis=2)  # (T, 4)
    env = env / (env.mean(axis=0, keepdims=True) + 1e-9)
    mod = np.abs(np.fft.rfft(env - env.mean(0), axis=0))[1 : 1 + 24]  # (24, 4)
    feat.append(np.log(mod + 1e-8).reshape(-1))
    # spectral flatness per frame (quantization/hiss raises the floor)
    flat = np.exp(np.log(mag + 1e-9).mean(axis=1)) / (mag.mean(axis=1) + 1e-9)
    feat.append(np.array([flat.mean(), flat.std()]))
    # sample-level kurtosis & diff-energy (clipping / phase scrambling)
    d = np.diff(x)
    feat.append(
        np.array(
            [
                np.mean(x**4) / (np.mean(x**2) ** 2 + 1e-12),
                np.log(np.mean(d**2) / (np.mean(x**2) + 1e-12) + 1e-9),
            ]
        )
    )
    return np.concatenate(feat)


def _eer(scores: np.ndarray, labels: np.ndarray) -> float:
    order = np.argsort(scores)
    lab = labels[order]
    n_pos, n_neg = lab.sum(), len(lab) - lab.sum()
    frr = np.concatenate([[0], np.cumsum(lab)]) / max(n_pos, 1)
    far = 1 - np.concatenate([[0], np.cumsum(1 - lab)]) / max(n_neg, 1)
    i = np.argmin(np.abs(frr - far))
    return 100 * float(frr[i] + far[i]) / 2


def _fit_score(Xtr, ytr, Xte):
    mu, sig = Xtr.mean(0), Xtr.std(0) + 1e-9
    Xtr = (Xtr - mu) / sig
    Xte = (Xte - mu) / sig
    A = Xtr.T @ Xtr + 10.0 * np.eye(Xtr.shape[1])
    w = np.linalg.solve(A, Xtr.T @ (2.0 * ytr - 1.0))
    return Xte @ w


def corpus_mem(n, seed, kind):
    """In-memory corpus: list of (x, label, attack)."""
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        ns = int(np.clip(np.exp(rng.normal(np.log(3.2), 0.35)), 1.2, 10.0) * SR)
        attack = 7 + i % 13
        if i % 2 == 0:
            x = (sd._bonafide if kind == "easy" else sd._bonafide_hard)(rng, ns)
            out.append((x, 1, None))
        else:
            if kind == "easy":
                x = sd._spoof(rng, ns)
            else:
                x = sd._spoof_hard(rng, ns, attack)
            out.append((x, 0, attack))
    return out


def corpus_disk(root: Path, split: str, n: int):
    """Read the first n utterances of an on-disk synth LA split."""
    from rade_tpu.data.audio_io import read_audio
    from rade_tpu.data.protocols import parse_protocol_labeled

    names = {
        "train": ("ASVspoof2019_LA_train", "ASVspoof2019.LA.cm.train.trn.txt"),
        "dev": ("ASVspoof2019_LA_dev", "ASVspoof2019.LA.cm.dev.trl.txt"),
    }
    dirname, protoname = names[split]
    proto = root / "ASVspoof2019_LA_cm_protocols" / protoname
    labels, keys = parse_protocol_labeled(proto)
    out = []
    for key in keys[:n]:
        for ext in (".flac", ".wav"):
            p = root / dirname / "flac" / (key + ext)
            if p.exists():
                x, _ = read_audio(p)
                out.append((np.asarray(x, np.float64), int(labels[key]), None))
                break
    return out


def proxy_eer(train_set, dev_set, seed=0, aug_reps=2):
    rng = np.random.RandomState(seed + 100)
    Xtr, ytr = [], []
    for x, lab, _ in train_set:
        for _ in range(aug_reps):
            Xtr.append(_features(_augment(x.copy(), rng)))
            ytr.append(lab)
    Xte = np.stack([_features(x) for x, _, _ in dev_set])
    yte = np.array([lab for _, lab, _ in dev_set])
    scores = _fit_score(np.stack(Xtr), np.array(ytr), Xte)
    overall = _eer(scores, yte)
    per_attack = {}
    attacks = sorted({a for _, _, a in dev_set if a is not None})
    for a in attacks:
        mask = np.array([(l == 1) or (aa == a) for _, l, aa in dev_set])
        per_attack[f"A{a:02d}"] = _eer(scores[mask], yte[mask])
    return overall, per_attack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--v2-dir", default="/root/data/synthla2k_hard2")
    args = ap.parse_args()

    results = {}
    for kind in ("easy", "hard_v3"):
        tr = corpus_mem(args.n, args.seed, "easy" if kind == "easy" else "hard")
        de = corpus_mem(args.n, args.seed + 1, "easy" if kind == "easy" else "hard")
        eer, per = proxy_eer(tr, de, args.seed)
        results[kind] = (eer, per)
        print(f"{kind:10s}: proxy EER {eer:5.1f}%  "
              + " ".join(f"{k}={v:.0f}" for k, v in per.items()))
    v2 = Path(args.v2_dir)
    if v2.exists():
        tr = corpus_disk(v2, "train", args.n)
        de = corpus_disk(v2, "dev", args.n)
        if tr and de:
            eer, _ = proxy_eer(tr, de, args.seed)
            results["hard_v2_disk"] = (eer, {})
            print(f"hard_v2_disk: proxy EER {eer:5.1f}%")
    return results


if __name__ == "__main__":
    main()
