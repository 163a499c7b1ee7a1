"""Dataset extraction monitor: watch a directory fill up, report progress.

Equivalent of `/root/reference/monitor_extraction.py`: polls the target
dataset directory, reports file counts / size growth, and exits once counts
are stable (extraction finished).

Usage: python -m rade_tpu.tools.monitor_extraction --dir ./LA [--expected N]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def snapshot(root: Path):
    n, size = 0, 0
    for p in root.rglob("*"):
        if p.is_file():
            n += 1
            size += p.stat().st_size
    return n, size


def monitor(root: str, expected: int = 0, interval: float = 30, max_polls=None):
    root = Path(root)
    prev = (-1, -1)
    polls = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        cur = snapshot(root) if root.exists() else (0, 0)
        pct = f" ({100.0 * cur[0] / expected:.1f}%)" if expected else ""
        print(f"[monitor] {cur[0]} files, {cur[1] / 1e9:.2f} GB{pct}")
        if cur == prev and cur[0] > 0:
            print("[monitor] stable — extraction appears complete")
            return cur
        prev = cur
        time.sleep(interval)
    return prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--expected", type=int, default=0)
    ap.add_argument("--interval", type=float, default=30)
    ap.add_argument("--max_polls", type=int, default=None)
    args = ap.parse_args()
    monitor(args.dir, args.expected, args.interval, args.max_polls)


if __name__ == "__main__":
    main()
