"""Compare two anchor runs' dev-EER trajectories (recipe-sensitivity proof).

The hard anchor's purpose is regression detection: a broken recipe must
produce a PLAINLY different trajectory on the same data.  This prints the
side-by-side per-epoch table and summary deltas for two run dirs
(metric_log.txt + metrics/scalars.jsonl), e.g. the full Phase-6 recipe vs
the same run with FGM disabled (configs/Phase6_AnchorHard_NoFGM.conf).

Usage: python benchmarks/compare_anchor_runs.py RUN_A RUN_B [--label-a X --label-b Y]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np


def read_run(run_dir: str):
    d = Path(run_dir)
    rows = []
    scal = d / "metrics" / "scalars.jsonl"
    if scal.exists():
        for line in scal.read_text().splitlines():
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if not rows:  # fall back to metric_log.txt
        pat = re.compile(
            r"^(\d+): loss=([\d.]+) dev_eer=([\d.]+) dev_tdcf=([\d.]+)"
        )
        for line in (d / "metric_log.txt").read_text().splitlines():
            m = pat.match(line)
            if m:
                rows.append({
                    "epoch": int(m.group(1)), "loss": float(m.group(2)),
                    "dev_eer": float(m.group(3)), "dev_tdcf": float(m.group(4)),
                })
    final = None
    ml = d / "metric_log.txt"
    if ml.exists():
        for line in ml.read_text().splitlines():
            if line.startswith("final:"):
                final = line
    return rows, final


def summarize(rows):
    eers = [r["dev_eer"] for r in rows]
    return {
        "epochs": len(rows),
        "first": eers[0] if eers else None,
        "best": min(eers) if eers else None,
        "best_epoch": int(np.argmin(eers)) if eers else None,
        "last": eers[-1] if eers else None,
        "mean_last5": float(np.mean(eers[-5:])) if eers else None,
        "traj_auc": float(np.mean(eers)) if eers else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("--label-a", default=None)
    ap.add_argument("--label-b", default=None)
    args = ap.parse_args()
    la = args.label_a or Path(args.run_a).name
    lb = args.label_b or Path(args.run_b).name

    rows_a, final_a = read_run(args.run_a)
    rows_b, final_b = read_run(args.run_b)
    ea = {r["epoch"]: r["dev_eer"] for r in rows_a}
    eb = {r["epoch"]: r["dev_eer"] for r in rows_b}
    print(f"{'epoch':>5s} {la:>14s} {lb:>14s} {'delta':>8s}")
    for ep in sorted(set(ea) | set(eb)):
        a, b = ea.get(ep), eb.get(ep)
        d = f"{b - a:+8.1f}" if (a is not None and b is not None) else "       -"
        print(f"{ep:5d} {a if a is not None else float('nan'):14.1f} "
              f"{b if b is not None else float('nan'):14.1f} {d}")
    sa, sb = summarize(rows_a), summarize(rows_b)
    print("\nsummary (dev EER %):")
    for k in ("first", "best", "best_epoch", "last", "mean_last5", "traj_auc"):
        print(f"  {k:12s} {sa[k]!s:>12s} {sb[k]!s:>12s}")
    if final_a:
        print(f"\n{la} {final_a}")
    if final_b:
        print(f"{lb} {final_b}")
    if sa["mean_last5"] is not None and sb["mean_last5"] is not None:
        d = sb["mean_last5"] - sa["mean_last5"]
        print(f"\nplateau delta (mean last-5 dev EER): {d:+.1f} points")


if __name__ == "__main__":
    main()
