"""CLI entry point — reference-compatible train/eval driver.

Same flag surface as `/root/reference/src/main.py:1129-1175`:

    python -m rade_tpu.main --config C [--eval] [--resume CKPT]
        [--pretrained_weights W] [--start_epoch N] [--model ARCH]
        [--seed S] [--comment TAG] [--output_dir D] [--eval_model_weights W]

Train: Phase-style epoch loop (see train/loop.py).  Eval: score the 2019 eval
set (or the 2021-DF set when ``is_eval_2021``) with a checkpoint and report
EER/min-tDCF — including the 2021 path the reference ships broken
(`main.py:36,365-391` calls a module that does not exist).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from rade_tpu.config import ExperimentConfig, load_config


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="TPU-native ASVspoof training/eval")
    p.add_argument("--config", required=True, help="path to .conf (JSON)")
    p.add_argument("--output_dir", default="./exp_result")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--pretrained_weights", type=str, default=None)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--model", type=str, default=None, help="architecture override")
    p.add_argument("--comment", type=str, default=None)
    p.add_argument("--eval_model_weights", type=str, default=None)
    return p.parse_args(argv)


def run_eval(cfg: ExperimentConfig, args) -> None:
    from rade_tpu.data.datasets import EvalDataset
    from rade_tpu.data.pipeline import EvalBatcher
    from rade_tpu.data.protocols import parse_protocol_2021, parse_protocol_eval
    from rade_tpu.evaluate.eval2021 import calculate_eer_2021, write_codec_breakdown_report
    from rade_tpu.evaluate.scorer import (
        produce_evaluation_file,
        produce_evaluation_file_2021,
    )
    from rade_tpu.evaluate.scoring import calculate_tdcf_eer
    from rade_tpu.train.checkpoint import load_eval_weights
    from rade_tpu.train.loop import Experiment

    exp = Experiment(cfg, seed=args.seed)
    weights_path = args.eval_model_weights or cfg.model_path
    if weights_path and Path(weights_path).exists():
        exp.params, exp.batch_stats = load_eval_weights(
            weights_path,
            {"model": exp.params["model"], "loss": exp.params["loss"]},
            exp.batch_stats,
        )
        print(f"loaded weights from {weights_path}")
    else:
        print("WARNING: no weights found; scoring with random init")

    db = Path(cfg.database_path)
    if cfg.is_eval_2021:
        trial = db / "ASVspoof2021.DF.cm.eval.trl.txt"
        files = parse_protocol_2021(trial)
        ds = EvalDataset(files, db, cut=exp.nb_samp, zero_pad_on_error=True)
        out = Path(args.output_dir) / cfg.eval_output
        produce_evaluation_file_2021(
            exp.eval_step, exp.params, exp.batch_stats,
            EvalBatcher(ds, cfg.test.batch_size), files, out,
        )
        if cfg.key_file_2021 and Path(cfg.key_file_2021).exists():
            eer = calculate_eer_2021(str(out), cfg.key_file_2021)
            print(f"2021-DF EER: {eer:.3f}%")
            write_codec_breakdown_report(
                str(out), cfg.key_file_2021,
                str(Path(args.output_dir) / "report_2021df_codec.md"),
            )
        return

    track = cfg.track
    proto = db / f"ASVspoof2019_{track}_cm_protocols" / f"ASVspoof2019.{track}.cm.eval.trl.txt"
    files = parse_protocol_eval(proto)
    eval_dir = db / f"ASVspoof2019_{track}_eval"

    def _score(compressed: bool):
        """Score the clean or codec-COMPRESSED protocol (README.md:92)."""
        tag = "compressed_" if compressed else ""
        ds = EvalDataset(
            files, eval_dir, cut=exp.nb_samp,
            codec_sim=compressed, codec_seed=cfg.test.codec_seed,
            codec_inner_p=cfg.test.codec_inner_p,
        )
        out = Path(args.output_dir) / (tag + cfg.eval_output)
        produce_evaluation_file(
            exp.eval_step, exp.params, exp.batch_stats,
            EvalBatcher(ds, cfg.test.batch_size), proto, out,
        )
        eer, tdcf = calculate_tdcf_eer(
            str(out), cfg.asv_score_path,
            str(Path(args.output_dir) / f"t-DCF_EER{('_' + tag.rstrip('_')) if tag else ''}.txt"),
        )
        label = "compressed eval" if compressed else "eval"
        print(f"{label} EER: {eer:.4f}%  min t-DCF: {tdcf:.5f}")

    if not cfg.test.codec_sim:
        _score(compressed=False)
    # test_config.codec_sim scores ONLY the compressed protocol;
    # test_config.eval_compressed scores it IN ADDITION to the clean one
    if cfg.test.codec_sim or cfg.test.eval_compressed:
        _score(compressed=True)


def main(argv=None) -> None:
    from rade_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()  # no-op unless RADE_COORDINATOR is set
    args = parse_args(argv)
    cfg = load_config(args.config)
    if args.model:
        cfg.model_config["architecture"] = args.model
    if args.pretrained_weights:
        cfg.pretrained_weights = args.pretrained_weights

    if args.eval:
        run_eval(cfg, args)
        return

    from rade_tpu.train.loop import run_training

    summary = run_training(
        cfg,
        database_path=cfg.database_path,
        output_dir=args.output_dir,
        config_path=args.config,
        seed=args.seed,
        comment=args.comment or "",
        start_epoch=args.start_epoch,
        resume_path=args.resume,
    )
    print(
        f"done: best dev EER {summary['best_dev_eer']:.3f}% "
        f"(run dir {summary['run_dir']})"
    )


if __name__ == "__main__":
    main()
