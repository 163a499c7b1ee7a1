"""ASVspoof dataset download helper.

Equivalent of `/root/reference/utils/download_dataset.py` /
`download_keys.py`: fetches the ASVspoof2019 LA archive (and prints where the
2021 keys live).  Honors a zero-egress environment by just printing the
commands when the network is unavailable.

Usage: python -m rade_tpu.tools.download_dataset --out ./LA [--dry_run]
"""

from __future__ import annotations

import argparse
import subprocess
from pathlib import Path

LA_URL = "https://datashare.ed.ac.uk/bitstream/handle/10283/3336/LA.zip"
KEYS_2021_URL = (
    "https://www.asvspoof.org/asvspoof2021/DF-keys-full.tar.gz"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cmds = [
        ["curl", "-L", "-o", str(out / "LA.zip"), LA_URL],
        ["unzip", "-q", str(out / "LA.zip"), "-d", str(out)],
    ]
    print(f"# 2021-DF keys: {KEYS_2021_URL}")
    for cmd in cmds:
        print("+", " ".join(cmd))
        if args.dry_run:
            continue
        try:
            subprocess.run(cmd, check=True, timeout=3600 * 6)
        except Exception as e:
            print(f"download failed ({e}); run the printed commands on a networked host")
            break


if __name__ == "__main__":
    main()
