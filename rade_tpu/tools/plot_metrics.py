"""Plot a training run's scalar time-series (loss / EER / t-DCF / LR / speed).

The TPU-native observability counterpart of the reference's TensorBoard
scalars (`/root/reference/src/main.py:220,567-569,666-667`): the trainer
writes one JSON object per epoch to ``<run_dir>/metrics/scalars.jsonl``;
this tool renders them as a multi-panel PNG (and can dump a CSV).

Usage:
  python -m rade_tpu.tools.plot_metrics --run_dir exp_result/LA_... \
      [--out training_curves.png] [--csv scalars.csv]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, List


def load_scalars(run_dir: str) -> List[Dict[str, Any]]:
    path = Path(run_dir)
    if path.suffix == ".jsonl":
        scalars = path
    else:
        scalars = path / "metrics" / "scalars.jsonl"
    if not scalars.exists():
        raise FileNotFoundError(f"no scalar log at {scalars}")
    rows = []
    for line in scalars.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    # keep the LAST row per epoch (resumed runs append duplicate epochs)
    by_epoch: Dict[int, Dict[str, Any]] = {}
    for r in rows:
        by_epoch[int(r.get("epoch", -1))] = r
    return [by_epoch[e] for e in sorted(by_epoch)]


def _series(rows, key):
    xs, ys = [], []
    for r in rows:
        v = r.get(key)
        if v is None:
            continue
        xs.append(int(r["epoch"]))
        ys.append(float(v))
    return xs, ys


def plot(rows: List[Dict[str, Any]], out_path: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    panels = [
        (axes[0][0], [("loss", "train loss")], "loss"),
        (
            axes[0][1],
            [("dev_eer", "dev EER"), ("eval_eer", "eval EER (best epochs)")],
            "EER (%)",
        ),
        (
            axes[1][0],
            [("dev_tdcf", "dev min t-DCF"), ("eval_tdcf", "eval min t-DCF")],
            "min t-DCF",
        ),
        (axes[1][1], [("lr", "learning rate")], "LR"),
    ]
    for ax, series, ylabel in panels:
        for key, label in series:
            xs, ys = _series(rows, key)
            if xs:
                ax.plot(xs, ys, marker="o", markersize=3, label=label)
        ax.set_xlabel("epoch")
        ax.set_ylabel(ylabel)
        ax.grid(alpha=0.3)
        if len(series) > 1 or ylabel == "LR":
            ax.legend(fontsize=8)
    xs, ys = _series(rows, "utt_per_sec")
    if xs:
        ax2 = axes[0][0].twinx()
        ax2.plot(xs, ys, color="gray", alpha=0.5, linestyle="--")
        ax2.set_ylabel("utt/s", color="gray")
    fig.suptitle("rade_tpu training run")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def dump_csv(rows: List[Dict[str, Any]], out_path: str) -> str:
    keys: List[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    with open(out_path, "w") as f:
        f.write(",".join(keys) + "\n")
        for r in rows:
            f.write(",".join("" if r.get(k) is None else str(r.get(k)) for k in keys) + "\n")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True, help="run dir or scalars.jsonl path")
    ap.add_argument("--out", default="training_curves.png")
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()
    rows = load_scalars(args.run_dir)
    if not rows:
        raise SystemExit("scalar log is empty")
    print(f"{len(rows)} epochs; last: {json.dumps(rows[-1])}")
    print("wrote", plot(rows, args.out))
    if args.csv:
        print("wrote", dump_csv(rows, args.csv))


if __name__ == "__main__":
    main()
