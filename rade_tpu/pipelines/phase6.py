"""Phase-6 pipeline: dirty-data filter -> patched config -> training run.

Port of `/root/reference/src/run_phase6_pipeline.sh`: (1) rank train samples
by a Phase-5 model's loss and drop the top-ratio dirtiest, (2) clone the
Phase-6 config injecting ``custom_train_protocol`` and ``use_codec_aug``,
(3) launch training.

Usage:
  python -m rade_tpu.pipelines.phase6 --config configs/Phase6_Proposed.conf \
      [--phase5_weights W] [--filter_ratio 0.02] [--output_dir D] [--skip_filter]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from rade_tpu.config import load_config


def run_pipeline(
    config_path: str,
    phase5_weights: str = "",
    filter_ratio: float = 0.02,
    output_dir: str = "./exp_result",
    seed: int = 1234,
    skip_filter: bool = False,
):
    cfg = load_config(config_path)
    work = Path(output_dir) / "phase6_pipeline"
    work.mkdir(parents=True, exist_ok=True)

    raw = json.loads(Path(config_path).read_text())

    if not skip_filter:
        from .filter_dirty import rank_samples_by_loss, write_filtered_protocol

        print(f"[phase6] filtering top {filter_ratio:.1%} dirtiest train samples")
        keys, _, proto = rank_samples_by_loss(cfg, phase5_weights, seed)
        _, clean_proto = write_filtered_protocol(proto, keys, filter_ratio, work)
        raw.setdefault("data_config", {})["custom_train_protocol"] = str(clean_proto)

    raw.setdefault("data_config", {})["use_codec_aug"] = True
    run_config = work / "Phase6_Run.conf"
    run_config.write_text(json.dumps(raw, indent=4))
    print(f"[phase6] patched config -> {run_config}")

    from rade_tpu.train.loop import run_training

    cfg_run = load_config(run_config)
    return run_training(
        cfg_run,
        database_path=cfg_run.database_path,
        output_dir=output_dir,
        config_path=str(run_config),
        seed=seed,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--phase5_weights", default="")
    ap.add_argument("--filter_ratio", type=float, default=0.02)
    ap.add_argument("--output_dir", default="./exp_result")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--skip_filter", action="store_true")
    args = ap.parse_args()
    summary = run_pipeline(
        args.config, args.phase5_weights, args.filter_ratio,
        args.output_dir, args.seed, args.skip_filter,
    )
    print(f"[phase6] done: best dev EER {summary['best_dev_eer']:.3f}%")


if __name__ == "__main__":
    main()
