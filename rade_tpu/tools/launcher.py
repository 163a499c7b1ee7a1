"""Detached training launcher with PID file and log redirection.

Equivalent of `/root/reference/launcher.py` (without its hardcoded paths):
starts `python -m rade_tpu.main` detached, writes a PID file, tees output to
a log.

Usage: python -m rade_tpu.tools.launcher --config C [--output_dir D] [-- extra args]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path


def launch(config: str, output_dir: str = "./exp_result", extra=()):
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    log_path = out / "train.log"
    pid_path = out / "train.pid"
    cmd = [
        sys.executable, "-m", "rade_tpu.main",
        "--config", config, "--output_dir", output_dir, *extra,
    ]
    with open(log_path, "ab") as log:
        proc = subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT,
            start_new_session=True, cwd=os.getcwd(),
        )
    pid_path.write_text(str(proc.pid))
    return proc.pid, log_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--output_dir", default="./exp_result")
    args, extra = ap.parse_known_args()
    pid, log = launch(args.config, args.output_dir, extra)
    print(f"launched pid={pid}, log={log}")


if __name__ == "__main__":
    main()
