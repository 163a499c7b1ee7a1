"""Dataset integrity check: every audio file readable and 16 kHz.

Equivalent of `/root/reference/utils/check_dataset.py` (full scan) and
`utils/quick_verify_dataset.py` (random sample), using the native FLAC
decoder / WAV reader.

Usage:
  python -m rade_tpu.tools.check_dataset --database_path ./LA [--quick N]
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

from rade_tpu.data.audio_io import read_audio


def check_dir(audio_dir: Path, sample: int = 0, expect_sr: int = 16000):
    files = sorted(
        p for ext in ("*.flac", "*.wav", "*.npy") for p in audio_dir.glob(ext)
    )
    if sample and len(files) > sample:
        files = random.Random(0).sample(files, sample)
    bad = []
    for p in files:
        try:
            x, sr = read_audio(p)
            if sr != expect_sr:
                bad.append((p, f"sample rate {sr}"))
            elif x.shape[0] == 0:
                bad.append((p, "empty"))
        except Exception as e:
            bad.append((p, str(e)))
    return len(files), bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--database_path", required=True)
    ap.add_argument("--quick", type=int, default=0, help="random-sample N files")
    args = ap.parse_args()
    root = Path(args.database_path)
    total_checked, total_bad = 0, 0
    for split_dir in sorted(root.glob("ASVspoof2019_*_*")):
        flac_dir = split_dir / "flac"
        if not flac_dir.is_dir():
            continue
        n, bad = check_dir(flac_dir, sample=args.quick)
        total_checked += n
        total_bad += len(bad)
        status = "OK" if not bad else f"{len(bad)} BAD"
        print(f"{split_dir.name}: {n} files, {status}")
        for p, reason in bad[:20]:
            print(f"  BAD {p}: {reason}")
    print(f"checked {total_checked} files, {total_bad} bad")
    raise SystemExit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
